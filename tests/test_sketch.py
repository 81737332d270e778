"""HyperLogLog sketch: exact register parity vs SQL, estimate accuracy."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.sketch import approx_count_distinct, hll_registers


def _register_sql(p: int, key: str, col: str, table: str) -> str:
    w = 64 - p
    return (
        f"WITH h AS (SELECT {key}, ('0x' || substr(md5(CAST({col} AS "
        f"VARCHAR)), 1, 16))::UBIGINT AS hv FROM {table}), "
        f"b AS (SELECT {key} AS k, (hv >> {w})::BIGINT AS idx, "
        f"hv & ((1::UBIGINT << {w}) - 1) AS low FROM h), "
        "s1 AS (SELECT k, idx, low | (low >> 1) AS x FROM b), "
        "s2 AS (SELECT k, idx, x | (x >> 2) AS x FROM s1), "
        "s3 AS (SELECT k, idx, x | (x >> 4) AS x FROM s2), "
        "s4 AS (SELECT k, idx, x | (x >> 8) AS x FROM s3), "
        "s5 AS (SELECT k, idx, x | (x >> 16) AS x FROM s4), "
        "s6 AS (SELECT k, idx, x | (x >> 32) AS x FROM s5) "
        f"SELECT k AS {key}, idx, max(({w} - bit_count(x))::BIGINT + 1) AS rank "
        "FROM s6 GROUP BY k, idx"
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(cols).reset_index(drop=True)


class TestRegisters:
    def test_matches_duckdb(self):
        rng = np.random.default_rng(13)
        n = 3000
        tbl = pa.table(
            {
                "grp": rng.choice(["a", "b", "c"], n).tolist(),
                "val": rng.integers(0, 800, n).tolist(),
            }
        )
        got = hll_registers(
            ray.data.from_arrow(tbl).repartition(5), "val", key="grp", precision=8
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(_register_sql(8, "grp", "val", "t")).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_exact_partition_invariance(self):
        rng = np.random.default_rng(4)
        tbl = pa.table({"val": rng.integers(0, 5000, 4000).tolist()})
        ds = ray.data.from_arrow(tbl)
        a = hll_registers(ds.repartition(1), "val", precision=10, num_partitions=1)
        b = hll_registers(ds.repartition(9), "val", precision=10, num_partitions=6)
        pd.testing.assert_frame_equal(_canon(a.to_pandas()), _canon(b.to_pandas()))


class TestEstimate:
    def test_accuracy_large(self):
        rng = np.random.default_rng(21)
        vals = rng.integers(0, 20000, 60000)
        exact = len(np.unique(vals))
        tbl = pa.table({"val": vals.tolist()})
        got = approx_count_distinct(
            ray.data.from_arrow(tbl).repartition(6), "val", precision=12
        ).to_pandas()
        est = int(got.approx_n.iloc[0])
        assert abs(est - exact) / exact < 0.05

    def test_small_cardinality_near_exact(self):
        tbl = pa.table({"val": [1, 2, 3, 4, 5] * 100})
        got = approx_count_distinct(ray.data.from_arrow(tbl), "val").to_pandas()
        assert int(got.approx_n.iloc[0]) == 5

    def test_grouped_accuracy_and_schema(self):
        rng = np.random.default_rng(2)
        n = 30000
        grp = rng.choice(["x", "y"], n)
        val = np.where(grp == "x", rng.integers(0, 500, n), rng.integers(0, 9000, n))
        tbl = pa.table({"grp": grp.tolist(), "val": val.tolist()})
        got = (
            approx_count_distinct(
                ray.data.from_arrow(tbl).repartition(4), "val", key="grp",
                precision=12, alias="nd",
            )
            .to_pandas()
            .set_index("grp")["nd"]
        )
        for g in ("x", "y"):
            exact = len(np.unique(val[grp == g]))
            assert abs(int(got[g]) - exact) / exact < 0.06

    def test_empty(self):
        tbl = pa.table({"val": pa.array([], pa.int64())})
        assert approx_count_distinct(ray.data.from_arrow(tbl), "val").count() == 0


def _cms_sql(depth: int, width: int, col: str, table: str) -> str:
    return (
        f"WITH rows AS (SELECT {col} AS v FROM {table}), "
        f"d AS (SELECT unnest(range({depth})) AS d), "
        "h AS (SELECT d.d, (('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || "
        f"CAST(v AS VARCHAR)), 1, 16))::UBIGINT % {width})::BIGINT AS idx "
        "FROM rows CROSS JOIN d) "
        "SELECT d, idx, count(*)::BIGINT AS cnt FROM h GROUP BY d, idx"
    )


class TestCountMin:
    def test_registers_match_duckdb(self):
        from text_dedup_ray.pipelines.sketch import cms_registers

        rng = np.random.default_rng(8)
        tbl = pa.table({"val": rng.integers(0, 300, 2000).tolist()})
        got = cms_registers(
            ray.data.from_arrow(tbl).repartition(5), "val", depth=3, width=64,
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(_cms_sql(3, 64, "val", "t")).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_estimates_never_undercount_and_tight_on_heavy(self):
        from text_dedup_ray.pipelines.sketch import cms_point_estimates, cms_registers

        rng = np.random.default_rng(12)
        light = rng.integers(1000, 9000, 5000).tolist()
        vals = light + ["heavy"] * 800 + ["medium"] * 200
        tbl = pa.table({"val": [str(v) for v in vals]})
        regs = cms_registers(
            ray.data.from_arrow(tbl).repartition(4), "val", depth=4, width=2048
        )
        est = cms_point_estimates(regs, ["heavy", "medium", "absent"], depth=4, width=2048)
        assert est["heavy"] >= 800 and est["heavy"] <= 800 + 2 * len(vals) // 2048
        assert est["medium"] >= 200 and est["medium"] <= 200 + 2 * len(vals) // 2048
        assert est["absent"] <= 2 * len(vals) // 2048

    def test_exact_partition_invariance(self):
        from text_dedup_ray.pipelines.sketch import cms_registers

        rng = np.random.default_rng(2)
        tbl = pa.table({"val": rng.integers(0, 999, 3000).tolist()})
        ds = ray.data.from_arrow(tbl)
        a = cms_registers(ds.repartition(1), "val", num_partitions=1).to_pandas()
        b = cms_registers(ds.repartition(8), "val", num_partitions=5).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))


class TestDupRateEstimate:
    def test_duplicate_heavy_corpus(self, ray_session):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.sketch import dup_rate_estimate

        # 1000 rows, 100 distinct texts: per-source true dup rate is
        # 1 - 100/500 = 0.8, global is 1 - 100/1000 = 0.9; HLL(p=12)
        # relative error ~1.6%, so estimates must land within a few %
        texts = [f"document number {i % 100} with some words" for i in range(1000)]
        srcs = ["a" if i < 500 else "b" for i in range(1000)]
        ds = ray.data.from_arrow(
            pa.table({"source": pa.array(srcs), "text": pa.array(texts)})
        )
        t = dup_rate_estimate(ds, "text", key="source").to_pandas()
        t = t.set_index("source")
        assert int(t.loc["a", "n_rows"]) == 500
        for s in ("a", "b"):
            est = int(t.loc[s, "n_distinct_approx"])
            assert abs(est - 100) <= 5
            assert abs(float(t.loc[s, "dup_rate_est"]) - 0.8) < 0.02

        g = dup_rate_estimate(ds, "text").to_pandas()
        assert int(g["n_rows"].iloc[0]) == 1000
        assert abs(int(g["n_distinct_approx"].iloc[0]) - 100) <= 5
        assert abs(float(g["dup_rate_est"].iloc[0]) - 0.9) < 0.01

    def test_null_semantics_and_rounding(self, ray_session):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.sketch import dup_rate_estimate

        # NULL text counts in n_rows, never in the distinct estimate (SQL
        # COUNT(DISTINCT)); NULL-key rows are excluded from a keyed report
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(["a", "a", None, "a"]),
                    "text": pa.array(["x", None, "y", "x"]),
                }
            )
        )
        t = dup_rate_estimate(ds, "text", key="source").to_pandas()
        assert list(t["source"]) == ["a"]
        assert int(t["n_rows"].iloc[0]) == 3  # NULL text row still counts
        assert int(t["n_distinct_approx"].iloc[0]) == 1  # just "x"

        # half-away-from-zero rounding (DuckDB round parity): 1/128 is an
        # exact dyadic tie at the 7th decimal — must come out 0.007813,
        # not banker's 0.007812
        texts = [f"u{i}" for i in range(127)] + ["u0"]
        g = dup_rate_estimate(
            ray.data.from_arrow(pa.table({"text": pa.array(texts)})), "text"
        ).to_pandas()
        if int(g["n_distinct_approx"].iloc[0]) == 127:  # HLL exact here
            assert float(g["dup_rate_est"].iloc[0]) == 0.007813

    def test_partition_invariance_and_clamp(self, ray_session):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.sketch import dup_rate_estimate

        texts = [f"t{i % 7}" for i in range(50)]
        t1 = dup_rate_estimate(
            ray.data.from_arrow(pa.table({"text": pa.array(texts)})), "text"
        )
        t2 = dup_rate_estimate(
            ray.data.from_arrow(
                pa.table({"text": pa.array(texts)})
            ).repartition(13),
            "text",
        )
        assert t1.to_pydict() == t2.to_pydict()
        # rate never negative even if HLL over-estimates (est clamped <= n)
        assert float(t1["dup_rate_est"][0].as_py()) >= 0.0

    def test_rounding_parity_vs_duckdb(self):
        # the engine's half-away-from-zero kernel must equal DuckDB's
        # round(x, 6) for every rate the estimator can produce (x = 1-e/n)
        import duckdb
        import numpy as np

        rng = np.random.default_rng(7)
        ns = rng.integers(1, 5000, size=300)
        es = (rng.random(300) * ns).astype(np.int64)
        raw = 1.0 - es / ns
        engine = np.floor(raw * 1e6 + 0.5) / 1e6
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame({"x": raw}))
        oracle = [
            r[0] for r in con.execute("SELECT round(x, 6) FROM t").fetchall()
        ]
        assert engine.tolist() == oracle
