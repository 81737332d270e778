"""Moment-based statistics: Welch A/B and grouped OLS."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.stats import grouped_ols, welch_ab_test


def _canon(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


class TestWelch:
    def test_matches_duckdb(self):
        rng = np.random.default_rng(4)
        n = 5000
        tbl = pa.table(
            {
                "uid": rng.integers(0, 100, n).tolist(),
                "v": np.round(rng.normal(10, 3, n)
                              + (rng.integers(0, 100, n) % 2) * 0.5, 3).tolist(),
            }
        )

        def variant(b):
            return (b["uid"].to_numpy(zero_copy_only=False) % 2).astype(np.int64)

        got = welch_ab_test(
            ray.data.from_arrow(tbl).repartition(5), variant, "v"
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH s AS (SELECT uid % 2 AS v, t.v AS val FROM t), "
            "a AS (SELECT count(*) n, avg(val) m, var_samp(val) s FROM s WHERE v = 0), "
            "b AS (SELECT count(*) n, avg(val) m, var_samp(val) s FROM s WHERE v = 1) "
            "SELECT a.n::BIGINT AS n0, b.n::BIGINT AS n1, round(a.m, 4) AS mean0, "
            "round(b.m, 4) AS mean1, "
            "round((a.m - b.m) / sqrt(a.s / a.n + b.s / b.n), 4) AS welch_t FROM a, b"
        ).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)

    def test_identical_arms_t_zero(self):
        tbl = pa.table({"uid": [0, 1, 2, 3] * 10, "v": [5.0, 5.0, 7.0, 7.0] * 10})

        def variant(b):
            return (b["uid"].to_numpy(zero_copy_only=False) % 2).astype(np.int64)

        got = welch_ab_test(ray.data.from_arrow(tbl), variant, "v").to_pandas()
        assert got.iloc[0].welch_t == 0.0


class TestGroupedOLS:
    def test_matches_duckdb_regr(self):
        rng = np.random.default_rng(9)
        n = 4000
        g = rng.choice(["a", "b"], n)
        x = rng.integers(0, 24, n).astype(np.float64)
        y = np.where(g == "a", 2.0 * x + 1, -0.5 * x + 3) + rng.normal(0, 1, n)
        tbl = pa.table({"g": g.tolist(), "x": x, "y": np.round(y, 3)})
        got = grouped_ols(
            ray.data.from_arrow(tbl).repartition(5), "g", "x", "y"
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT g, round(regr_slope(y, x), 6) AS slope, "
            "round(regr_intercept(y, x), 6) AS intercept, "
            "round(regr_r2(y, x), 6) AS r2 FROM t GROUP BY g"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)
        h = dict(zip(got.g, got.slope))
        assert abs(h["a"] - 2.0) < 0.1 and abs(h["b"] + 0.5) < 0.1

    def test_degenerate_groups_match_duckdb_regr(self):
        # constant x -> NULL slope/intercept/r2; constant y (varying x) ->
        # slope 0, r2 = 1.0 — both pinned against DuckDB itself
        tbl = pa.table(
            {
                "g": ["cx"] * 5 + ["cy"] * 5,
                "x": [3.0] * 5 + [1.0, 2, 3, 4, 5.0],
                "y": [1.0, 2, 3, 4, 5.0] + [7.0] * 5,
            }
        )
        got = grouped_ols(ray.data.from_arrow(tbl), "g", "x", "y").to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT g, round(regr_slope(y, x), 6) AS slope, "
            "round(regr_intercept(y, x), 6) AS intercept, "
            "round(regr_r2(y, x), 6) AS r2 FROM t GROUP BY g"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)
        cx = got.set_index("g").loc["cx"]
        cy = got.set_index("g").loc["cy"]
        assert pd.isna(cx.slope) and pd.isna(cx.intercept) and pd.isna(cx.r2)
        assert cy.slope == 0.0 and cy.r2 == 1.0
