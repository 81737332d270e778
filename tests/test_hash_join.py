"""Big-x-big hash equi-join through the two-sided exchange."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.joins import hash_join


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _tables(seed=7, n_l=400, n_r=900):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "k": rng.integers(0, 200, n_l).tolist(),
            "lv": rng.integers(0, 10_000, n_l).tolist(),
        }
    )
    right = pa.table(
        {
            "k": rng.integers(50, 260, n_r).tolist(),  # partial overlap
            "rv": rng.integers(0, 10_000, n_r).tolist(),
        }
    )
    return left, right


class TestHashJoin:
    def test_inner_matches_duckdb_with_duplicate_keys(self):
        left, right = _tables()
        got = hash_join(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(5),
            "k", "k", ["k", "lv"], ["rv"], how="inner", num_partitions=6,
        ).to_pandas()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        exp = con.execute(
            "SELECT l.k, l.lv, r.rv FROM l JOIN r ON l.k = r.k"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_left_join_nulls(self):
        left, right = _tables(seed=3)
        got = hash_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            "k", "k", ["k", "lv"], ["rv"], how="left",
        ).to_pandas()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        exp = con.execute(
            "SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r ON l.k = r.k"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_name_collision_suffix_and_key_rename(self):
        left = pa.table({"k": [1, 2], "v": [10, 20]})
        right = pa.table({"kk": [1, 1], "v": [7, 8]})
        got = hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "k", "kk", ["k", "v"], ["v"],
        ).to_pandas()
        assert sorted(got.columns) == ["k", "v", "v_r"]
        assert sorted(got.v_r.tolist()) == [7, 8] and set(got.k) == {1}

    def test_partition_invariance_and_empty_right(self):
        left, right = _tables(seed=11, n_l=60, n_r=80)
        ld, rd = ray.data.from_arrow(left), ray.data.from_arrow(right)
        a = hash_join(ld, rd, "k", "k", ["k", "lv"], ["rv"], num_partitions=1).to_pandas()
        b = hash_join(
            ld.repartition(5), rd.repartition(3), "k", "k", ["k", "lv"], ["rv"],
            num_partitions=7,
        ).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))
        empty = pa.table({"k": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
        assert hash_join(ld, ray.data.from_arrow(empty), "k", "k", ["k", "lv"], ["rv"]).count() == 0
        got_left = hash_join(
            ld, ray.data.from_arrow(empty), "k", "k", ["k", "lv"], ["rv"], how="left"
        ).to_pandas()
        assert len(got_left) == len(left) and got_left.rv.isna().all()


class TestOuterJoins:
    def test_right_and_full_match_duckdb(self):
        left, right = _tables(seed=21, n_l=150, n_r=200)
        ld = ray.data.from_arrow(left).repartition(3)
        rd = ray.data.from_arrow(right).repartition(4)
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        for how, sql in [
            ("right", "SELECT coalesce(l.k, r.k) AS k, l.lv, r.rv FROM l RIGHT JOIN r ON l.k = r.k"),
            ("full", "SELECT coalesce(l.k, r.k) AS k, l.lv, r.rv FROM l FULL JOIN r ON l.k = r.k"),
        ]:
            got = hash_join(
                ld, rd, "k", "k", ["k", "lv"], ["rv"], how=how, num_partitions=5
            ).to_pandas()
            exp = con.execute(sql).fetchdf()
            pd.testing.assert_frame_equal(
                _canon(got), _canon(exp), check_dtype=False
            )

    def test_full_with_empty_sides(self):
        left, right = _tables(seed=2, n_l=40, n_r=30)
        empty = pa.table({"k": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
        got = hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(empty),
            "k", "k", ["k", "lv"], ["rv"], how="full",
        ).to_pandas()
        assert len(got) == len(left) and got.rv.isna().all()
        empty_l = pa.table({"k": pa.array([], pa.int64()), "lv": pa.array([], pa.int64())})
        got2 = hash_join(
            ray.data.from_arrow(empty_l), ray.data.from_arrow(right),
            "k", "k", ["k", "lv"], ["rv"], how="full",
        ).to_pandas()
        assert len(got2) == len(right) and got2.lv.isna().all()
        assert sorted(got2.k) == sorted(right["k"].to_pylist())


class TestSkewSalt:
    def test_salted_equals_unsalted_with_hot_key(self):
        rng = np.random.default_rng(33)
        # one key carries 80% of the left side
        k_l = np.where(rng.random(2000) < 0.8, 7, rng.integers(0, 50, 2000))
        left = pa.table({"k": k_l.tolist(), "lv": list(range(2000))})
        right = pa.table(
            {"k": rng.integers(0, 50, 300).tolist(), "rv": list(range(300))}
        )
        ld = ray.data.from_arrow(left).repartition(4)
        rd = ray.data.from_arrow(right).repartition(3)
        base = hash_join(ld, rd, "k", "k", ["k", "lv"], ["rv"], num_partitions=8).to_pandas()
        for how in ("inner", "left"):
            salted = hash_join(
                ld, rd, "k", "k", ["k", "lv"], ["rv"], how=how,
                num_partitions=8, skew_salt=8,
            ).to_pandas()
            if how == "inner":
                pd.testing.assert_frame_equal(_canon(salted), _canon(base))
            else:
                exp = hash_join(
                    ld, rd, "k", "k", ["k", "lv"], ["rv"], how="left",
                    num_partitions=8,
                ).to_pandas()
                pd.testing.assert_frame_equal(_canon(salted), _canon(exp))

    def test_salt_validation(self):
        import pytest

        left, right = _tables(seed=1, n_l=10, n_r=10)
        ld, rd = ray.data.from_arrow(left), ray.data.from_arrow(right)
        with pytest.raises(ValueError):
            hash_join(ld, rd, "k", "k", ["k", "lv"], ["rv"], how="full", skew_salt=2)
        with pytest.raises(ValueError):
            hash_join(ld, rd, "k", "k", ["k", "lv"], ["rv"], skew_salt=99, num_partitions=8)


class TestSemiAnti:
    def test_semi_anti_match_duckdb(self):
        left, right = _tables(seed=8)
        ld = ray.data.from_arrow(left).repartition(3)
        rd = ray.data.from_arrow(right).repartition(4)
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        for how, sql in [
            ("semi", "SELECT k, lv FROM l WHERE k IN (SELECT k FROM r)"),
            ("anti", "SELECT k, lv FROM l WHERE k NOT IN (SELECT k FROM r)"),
        ]:
            got = hash_join(
                ld, rd, "k", "k", ["k", "lv"], ["rv"], how=how, num_partitions=5
            ).to_pandas()
            exp = con.execute(sql).fetchdf()
            pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)
            assert "rv" not in got.columns

    def test_semi_anti_partition_complement_and_salt(self):
        left, right = _tables(seed=4, n_l=300, n_r=100)
        ld = ray.data.from_arrow(left).repartition(4)
        rd = ray.data.from_arrow(right).repartition(2)
        semi = hash_join(ld, rd, "k", "k", ["k", "lv"], ["rv"], how="semi").to_pandas()
        anti = hash_join(ld, rd, "k", "k", ["k", "lv"], ["rv"], how="anti").to_pandas()
        assert len(semi) + len(anti) == len(left)
        # salted variants agree exactly
        for how, base in [("semi", semi), ("anti", anti)]:
            salted = hash_join(
                ld, rd, "k", "k", ["k", "lv"], ["rv"], how=how,
                num_partitions=16, skew_salt=8,
            ).to_pandas()
            pd.testing.assert_frame_equal(_canon(salted), _canon(base))


class TestJoinCardinality:
    def test_exact_vs_duckdb(self):
        import duckdb
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.joins import join_cardinality

        rng = np.random.default_rng(2)
        a = pa.table({"k": rng.integers(0, 50, 3000).tolist()})
        b = pa.table({"k": rng.integers(25, 80, 2000).tolist()})
        got = join_cardinality(
            ray.data.from_arrow(a).repartition(4),
            ray.data.from_arrow(b).repartition(3),
            "k", "k", num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("a", a)
        con.register("b", b)
        exp = con.execute(
            "WITH ca AS (SELECT k, count(*)::BIGINT AS c FROM a GROUP BY k), "
            "cb AS (SELECT k, count(*)::BIGINT AS c FROM b GROUP BY k) "
            "SELECT sum(ca.c * cb.c)::BIGINT AS est_rows, count(*)::BIGINT AS matched_keys, "
            "max(ca.c)::BIGINT AS max_left, max(cb.c)::BIGINT AS max_right "
            "FROM ca JOIN cb USING (k)"
        ).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)
        # cardinality must equal the real join's row count
        real = con.execute("SELECT count(*) FROM a JOIN b USING (k)").fetchone()[0]
        assert got.iloc[0].est_rows == real

    def test_disjoint_keys(self):
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.joins import join_cardinality

        a = pa.table({"k": [1, 2, 3]})
        b = pa.table({"k": [10, 11]})
        got = join_cardinality(
            ray.data.from_arrow(a), ray.data.from_arrow(b), "k", "k"
        ).to_pandas()
        assert got.iloc[0].est_rows == 0 and got.iloc[0].matched_keys == 0
