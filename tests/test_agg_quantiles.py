"""exact_quantiles (quantile_disc semantics) + grouped_count_distinct."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.agg import exact_quantiles, grouped_count_distinct


def _ds(values: np.ndarray, blocks: int = 4) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"x": pa.array(values, pa.int64())})
    ).repartition(blocks)


class TestExactQuantiles:
    QS = {"p10": 0.1, "p25": 0.25, "p50": 0.5, "p75": 0.75, "p99": 0.99}

    def _duck(self, values):
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [list(map(int, values))])
        cols = ", ".join(f"quantile_disc(x, {q}) AS {n}" for n, q in self.QS.items())
        return con.execute(f"SELECT {cols} FROM t").fetchdf().iloc[0].to_dict()

    def test_matches_duckdb_random(self):
        rng = np.random.default_rng(42)
        vals = rng.integers(0, 500, 10_000)
        got = exact_quantiles(_ds(vals), "x", self.QS, num_partitions=8).to_pydict()
        exp = self._duck(vals)
        assert {k: v[0] for k, v in got.items()} == exp

    def test_matches_duckdb_skewed_and_tiny(self):
        for vals in (
            np.array([7]),
            np.array([3, 3, 3, 3, 3]),
            np.concatenate([np.zeros(999, np.int64), [1000]]),
            np.arange(1, 101),
        ):
            got = exact_quantiles(_ds(vals, blocks=2), "x", self.QS, num_partitions=4).to_pydict()
            exp = self._duck(vals)
            assert {k: v[0] for k, v in got.items()} == exp, vals[:5]

    def test_negative_values(self):
        vals = np.array([-50, -10, 0, 10, 50, -50, -50])
        got = exact_quantiles(_ds(vals, blocks=2), "x", self.QS, num_partitions=4).to_pydict()
        exp = self._duck(vals)
        assert {k: v[0] for k, v in got.items()} == exp

    def test_empty(self):
        out = exact_quantiles(_ds(np.array([], np.int64), blocks=1), "x", {"p50": 0.5})
        assert out["p50"].to_pylist() == [None]


class TestGroupedCountDistinct:
    def _run(self, groups, vals, parts=8):
        ds = ray.data.from_arrow(
            pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.int64())})
        ).repartition(4)
        out = grouped_count_distinct(ds, "g", "v", alias="n", num_partitions=parts).to_pandas()
        return dict(zip(out.g, out.n))

    def test_basic(self):
        got = self._run(["a", "a", "a", "b", "b"], [1, 1, 2, 1, 1])
        assert got == {"a": 2, "b": 1}

    def test_cross_block_duplicates_counted_once(self):
        # the same (g, v) pair in every block must still count once
        groups = ["x"] * 400 + ["y"] * 400
        vals = [5] * 400 + list(range(400))
        assert self._run(groups, vals) == {"x": 1, "y": 400}

    def test_matches_duckdb_random(self):
        rng = np.random.default_rng(9)
        groups = rng.choice(["a", "b", "c", "d"], 5000).tolist()
        vals = rng.integers(0, 50, 5000)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT unnest(?) AS g, unnest(?) AS v",
            [groups, list(map(int, vals))],
        )
        exp = dict(
            con.execute("SELECT g, count(DISTINCT v) FROM t GROUP BY g").fetchall()
        )
        assert self._run(groups, vals, parts=5) == exp

    def test_partition_count_invariance(self):
        rng = np.random.default_rng(3)
        groups = rng.choice(["p", "q"], 1000).tolist()
        vals = rng.integers(-100, 100, 1000)
        assert self._run(groups, vals, parts=1) == self._run(groups, vals, parts=17)


class TestGroupedQuantiles:
    QS = {"p25": 0.25, "p50": 0.5, "p90": 0.9}

    def _run(self, groups, vals, parts=8):
        from text_dedup_ray.pipelines.agg import grouped_quantiles

        ds = ray.data.from_arrow(
            pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.int64())})
        ).repartition(4)
        out = grouped_quantiles(ds, "g", "v", self.QS, num_partitions=parts)
        return out.to_pandas().sort_values("g").reset_index(drop=True)

    def test_matches_duckdb(self):
        rng = np.random.default_rng(17)
        groups = rng.choice(["a", "b", "c", "d", "e"], 4000).tolist()
        vals = rng.integers(-50, 200, 4000)
        got = self._run(groups, vals)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT unnest(?) AS g, unnest(?) AS v",
            [groups, list(map(int, vals))],
        )
        cols = ", ".join(
            f"quantile_disc(v, {q})::BIGINT AS {n}" for n, q in self.QS.items()
        )
        exp = (
            con.execute(f"SELECT g, {cols} FROM t GROUP BY g ORDER BY g")
            .fetchdf()
            .reset_index(drop=True)
        )
        assert got[["g"] + list(self.QS)].equals(exp)

    def test_single_member_groups_and_invariance(self):
        groups = ["x", "y", "z"]
        vals = [7, -3, 100]
        a = self._run(groups, vals, parts=1)
        b = self._run(groups, vals, parts=7)
        assert a.equals(b)
        assert a.p50.tolist() == [7, -3, 100]


class TestGroupedVectorMean:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.agg import grouped_vector_mean

        rng = np.random.default_rng(23)
        n, d = 500, 6
        labels = rng.choice(["a", "b", "c"], n).tolist()
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        tbl = pa.table(
            {
                "label": pa.array(labels),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        out = grouped_vector_mean(
            ray.data.from_arrow(tbl).repartition(5), "label", "embedding",
            num_partitions=4,
        ).to_pandas()
        out["mean"] = out["mean"].round(4)
        got = out.sort_values(["label", "dim"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            f"SELECT label, d.dim, round(avg(embedding[d.dim + 1]), 4) AS mean "
            f"FROM t CROSS JOIN (SELECT unnest(range({d})) AS dim) d "
            f"GROUP BY label, d.dim ORDER BY label, d.dim"
        ).fetchdf()
        assert got.label.tolist() == exp.label.tolist()
        assert got.dim.tolist() == exp.dim.tolist()
        assert np.allclose(got["mean"], exp["mean"], atol=2e-4)

    def test_partition_invariance_and_exactness(self):
        from text_dedup_ray.pipelines.agg import grouped_vector_mean

        tbl = pa.table(
            {
                "label": pa.array(["x", "x", "y"]),
                "embedding": pa.array(
                    [[1.0, 3.0], [3.0, 5.0], [10.0, -2.0]], pa.list_(pa.float32())
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        a = grouped_vector_mean(ds, "label", "embedding", num_partitions=1).to_pandas()
        b = grouped_vector_mean(ds, "label", "embedding", num_partitions=5).to_pandas()
        key = lambda df: df.sort_values(["label", "dim"]).reset_index(drop=True)
        assert key(a).equals(key(b))
        got = dict(zip(zip(key(a).label, key(a).dim), key(a)["mean"]))
        assert got == {("x", 0): 2.0, ("x", 1): 4.0, ("y", 0): 10.0, ("y", 1): -2.0}


class TestApproxQuantiles:
    def test_matches_duckdb_sample_exactly(self):
        from text_dedup_ray.pipelines.agg import approx_quantiles

        rng = np.random.default_rng(6)
        tbl = pa.table(
            {
                "id": list(range(5000)),
                "v": rng.lognormal(3, 1.2, 5000).tolist(),  # unbounded doubles
            }
        )
        got = approx_quantiles(
            ray.data.from_arrow(tbl).repartition(6), "v", "id",
            {"p50": 0.5, "p90": 0.9}, k=512,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH s AS (SELECT v FROM t ORDER BY "
            "('0x' || substr(md5(id::VARCHAR), 1, 8))::UBIGINT, id LIMIT 512) "
            "SELECT quantile_disc(v, 0.5) AS p50, quantile_disc(v, 0.9) AS p90 FROM s"
        ).fetchdf()
        assert got.p50[0] == exp.p50[0] and got.p90[0] == exp.p90[0]

    def test_exact_partition_invariance_and_accuracy(self):
        from text_dedup_ray.pipelines.agg import approx_quantiles

        rng = np.random.default_rng(14)
        v = rng.normal(100, 15, 50_000)
        tbl = pa.table({"id": list(range(50_000)), "v": v.tolist()})
        ds = ray.data.from_arrow(tbl)
        qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75}
        a = approx_quantiles(ds.repartition(1), "v", "id", qs, k=2048).to_pandas()
        b = approx_quantiles(ds.repartition(9), "v", "id", qs, k=2048).to_pandas()
        assert a.equals(b)  # bottom-k merge is exactly partition-invariant
        sv = np.sort(v)
        for name, q in qs.items():
            est = a[name][0]
            rank_err = abs(np.searchsorted(sv, est) / len(sv) - q)
            assert rank_err < 0.04, (name, est, rank_err)

    def test_empty(self):
        from text_dedup_ray.pipelines.agg import approx_quantiles

        tbl = pa.table({"id": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
        out = approx_quantiles(ray.data.from_arrow(tbl), "v", "id", {"p50": 0.5})
        assert out.to_pandas().p50.isna().all()


class TestSkewReport:
    def test_matches_duckdb(self):
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.agg import skew_report

        import numpy as np
        rng = np.random.default_rng(9)
        # zipf-ish: key 0 is hot
        keys = np.concatenate([np.zeros(500, np.int64), rng.integers(1, 50, 1500)])
        tbl = pa.table({"k": rng.permutation(keys).tolist()})
        got = skew_report(
            ray.data.from_arrow(tbl).repartition(5), "k", top_n=10,
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH c AS (SELECT k, count(*)::BIGINT AS cnt FROM t GROUP BY k), "
            "tt AS (SELECT sum(cnt) AS tot FROM c) "
            "SELECT k, cnt, round(cnt / tot, 6) AS share FROM c CROSS JOIN tt "
            "ORDER BY cnt DESC, k LIMIT 10"
        ).fetchdf()
        got = got.sort_values(["cnt", "k"], ascending=[False, True]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert got.iloc[0].k == 0 and abs(got.iloc[0].share - 0.25) < 0.01

    def test_string_keys(self):
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.agg import skew_report

        tbl = pa.table({"url": ["a.com"] * 6 + ["b.com"] * 3 + ["c.com"]})
        got = skew_report(
            ray.data.from_arrow(tbl).repartition(3), "url", top_n=2,
            num_partitions=3,
        ).to_pandas()
        got = got.sort_values("cnt", ascending=False).reset_index(drop=True)
        assert got.url.tolist() == ["a.com", "b.com"]
        assert got.cnt.tolist() == [6, 3]
        assert abs(got.share.iloc[0] - 0.6) < 1e-9


class TestGroupedGini:
    def test_matches_duckdb(self):
        import duckdb
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.agg import grouped_gini

        rng = np.random.default_rng(13)
        tbl = pa.table(
            {
                "g": rng.choice(["a", "b", "c"], 3000).tolist(),
                "v": rng.integers(1, 500, 3000).tolist(),
            }
        )
        got = grouped_gini(
            ray.data.from_arrow(tbl).repartition(5), "g", "v",
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS i, "
            "count(*) OVER (PARTITION BY g) AS n, sum(v) OVER (PARTITION BY g) AS s FROM t) "
            "SELECT g, round(2.0 * sum(i * v) / (max(n) * max(s)) "
            "- (max(n) + 1.0) / max(n), 6) AS gini FROM r GROUP BY g"
        ).fetchdf()
        got = got.sort_values("g").reset_index(drop=True)
        exp = exp.sort_values("g").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_extremes(self):
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.agg import grouped_gini

        # equal values -> gini 0; one owner of all mass -> near (n-1)/n
        tbl = pa.table(
            {
                "g": ["eq"] * 10 + ["skew"] * 10,
                "v": [5] * 10 + [0] * 9 + [1000],
            }
        )
        got = grouped_gini(ray.data.from_arrow(tbl), "g", "v").to_pandas()
        h = dict(zip(got.g, got.gini))
        assert h["eq"] == 0.0
        assert abs(h["skew"] - 0.9) < 1e-9

    def test_overflow_guard(self):
        import pyarrow as pa
        import pytest
        import ray

        from text_dedup_ray.pipelines.agg import grouped_gini

        tbl = pa.table({"g": ["a"] * 3, "v": [2**51, 2**51, 2**51]})
        with pytest.raises(Exception, match="exact-integer bound"):
            grouped_gini(ray.data.from_arrow(tbl), "g", "v").to_pandas()

    def test_overflow_guard_fires_before_products_wrap(self):
        import pyarrow as pa
        import pytest
        import ray

        from text_dedup_ray.pipelines.agg import grouped_gini

        # v*c here (2^55 * 300) wraps int64 — the guard must evaluate on
        # the raw bounds BEFORE the products form, not on wrapped sums
        tbl = pa.table({"g": ["a"] * 300, "v": [2**55] * 300})
        with pytest.raises(Exception, match="exact-integer bound"):
            grouped_gini(ray.data.from_arrow(tbl), "g", "v").to_pandas()
