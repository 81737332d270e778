"""Global CDF stamping and grouped z-scores (exact-integer moments)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.agg import grouped_zscore, with_global_cdf


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


class TestGlobalCdf:
    def test_matches_duckdb_cume_dist(self):
        rng = np.random.default_rng(31)
        tbl = pa.table(
            {"id": list(range(400)), "v": rng.integers(0, 50, 400).tolist()}
        )
        got = with_global_cdf(
            ray.data.from_arrow(tbl).repartition(5), "v", num_partitions=4
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT id, v, round(cume_dist() OVER (ORDER BY v), 6) AS cdf FROM t"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_extremes(self):
        tbl = pa.table({"id": [1, 2, 3, 4], "v": [10, 20, 20, 30]})
        got = (
            with_global_cdf(ray.data.from_arrow(tbl), "v")
            .to_pandas()
            .sort_values("id")
        )
        assert got.cdf.tolist() == [0.25, 0.75, 0.75, 1.0]


class TestGroupedZscore:
    def test_matches_duckdb_exact_expression(self):
        rng = np.random.default_rng(17)
        n = 500
        tbl = pa.table(
            {
                "id": list(range(n)),
                "g": rng.choice(["a", "b", "c"], n).tolist(),
                "v": rng.integers(0, 1000, n).tolist(),
            }
        )
        got = grouped_zscore(
            ray.data.from_arrow(tbl).repartition(4), "g", "v", num_partitions=3
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH m AS (SELECT g, sum(v)::DOUBLE s, sum(v*v)::DOUBLE ss, "
            "count(*)::DOUBLE n FROM t GROUP BY g) "
            "SELECT t.id, t.g, t.v, CASE WHEN m.ss/m.n - (m.s/m.n)*(m.s/m.n) > 0 "
            "THEN round((t.v - m.s/m.n) / sqrt(m.ss/m.n - (m.s/m.n)*(m.s/m.n)), 6) "
            "ELSE NULL END AS z FROM t JOIN m USING (g)"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_constant_group_is_null_and_stats(self):
        tbl = pa.table(
            {
                "id": [1, 2, 3, 4, 5],
                "g": ["c", "c", "c", "x", "x"],
                "v": [7, 7, 7, 0, 10],
            }
        )
        got = (
            grouped_zscore(ray.data.from_arrow(tbl), "g", "v")
            .to_pandas()
            .sort_values("id")
        )
        assert got.z.iloc[:3].isna().all()
        assert got.z.iloc[3:].tolist() == [-1.0, 1.0]

    def test_partition_invariance(self):
        tbl = pa.table(
            {"id": [1, 2, 3, 4], "g": ["a", "a", "b", "b"], "v": [1, 3, 5, 9]}
        )
        ds = ray.data.from_arrow(tbl)
        a = grouped_zscore(ds.repartition(1), "g", "v", num_partitions=1).to_pandas()
        b = grouped_zscore(ds.repartition(4), "g", "v", num_partitions=5).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))

    def test_int64_overflow_raises_instead_of_wrapping(self):
        # regression: values whose square exceeds int64 must raise, not
        # silently wrap in the exact-integer sum-of-squares accumulator
        import pytest

        big = 4_000_000_000  # big^2 > 2^63 - 1
        tbl = pa.table({"id": [1, 2], "g": ["a", "a"], "v": [big, big + 1]})
        with pytest.raises(Exception, match="overflow"):
            grouped_zscore(ray.data.from_arrow(tbl), "g", "v").to_pandas()


class TestGroupedPsi:
    def _sql(self, W, N, eps, ref):
        return (
            f"WITH bb AS (SELECT g, least(greatest(v // {W}, 0), {N-1}) AS b FROM t), "
            "h AS (SELECT g, b, count(*)::DOUBLE AS c FROM bb GROUP BY g, b), "
            f"grid AS (SELECT dg.g, gi.i AS b FROM (SELECT DISTINCT g FROM h) dg "
            f"CROSS JOIN (SELECT unnest(range({N})) AS i) gi), "
            "filled AS (SELECT grid.g, grid.b, coalesce(h.c, 0) AS c FROM grid "
            "LEFT JOIN h ON h.g = grid.g AND h.b = grid.b), "
            "tot AS (SELECT g, sum(c) AS t FROM filled GROUP BY g), "
            f"p AS (SELECT f.g, f.b, f.c / tot.t + {eps} AS p FROM filled f "
            "JOIN tot USING (g)), "
            f"ref AS (SELECT b, p AS pr FROM p WHERE g = '{ref}') "
            "SELECT p.g, round(sum((p.p - ref.pr) * ln(p.p / ref.pr)), 6) AS psi "
            f"FROM p JOIN ref USING (b) WHERE p.g <> '{ref}' GROUP BY p.g"
        )

    def test_matches_duckdb_and_detects_shift(self):
        from text_dedup_ray.pipelines.agg import grouped_psi

        rng = np.random.default_rng(7)
        same_a = rng.integers(0, 500, 2000)
        same_b = rng.integers(0, 500, 2000)
        shifted = rng.integers(300, 900, 2000)
        tbl = pa.table(
            {
                "g": ["ref"] * 2000 + ["twin"] * 2000 + ["drift"] * 2000,
                "v": np.concatenate([same_a, same_b, shifted]).tolist(),
            }
        )
        got = grouped_psi(
            ray.data.from_arrow(tbl).repartition(5), "g", "v",
            reference_group="ref", bin_width=100, n_bins=10, num_partitions=3,
        ).to_pandas().set_index("g")["psi"]
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(self._sql(100, 10, 1e-06, "ref")).fetchdf().set_index("g")["psi"]
        assert got.sort_index().equals(exp.sort_index())
        assert got["twin"] < 0.05 < got["drift"]  # standard PSI thresholds

    def test_partition_invariance(self):
        from text_dedup_ray.pipelines.agg import grouped_psi

        rng = np.random.default_rng(2)
        tbl = pa.table(
            {
                "g": rng.choice(["a", "b"], 600).tolist(),
                "v": rng.integers(0, 300, 600).tolist(),
            }
        )
        ds = ray.data.from_arrow(tbl)
        x = grouped_psi(ds.repartition(1), "g", "v", "a", 50, 6, num_partitions=1)
        y = grouped_psi(ds.repartition(7), "g", "v", "a", 50, 6, num_partitions=5)
        assert x.to_pandas().equals(y.to_pandas())
