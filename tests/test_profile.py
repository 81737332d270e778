"""Table profiler: exact per-column nulls / distinct / min-max."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.profile import profile_table


def _canon(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


class TestProfileTable:
    def test_nulls_distinct_minmax(self):
        rng = np.random.default_rng(3)
        n = 4000
        ints = rng.integers(0, 100, n).astype(np.float64)
        ints[rng.random(n) < 0.1] = np.nan  # ~10% nulls
        tbl = pa.table(
            {
                "a": pa.array(
                    [None if np.isnan(v) else int(v) for v in ints], pa.int64()
                ),
                "b": np.round(rng.random(n), 3),
                "s": rng.choice(["x", "y", "z", "w"], n).tolist(),
            }
        )
        got = profile_table(
            ray.data.from_arrow(tbl).repartition(5), ["a", "b", "s"],
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT 'a' AS column, count(*)::BIGINT AS n_rows, "
            "(count(*) - count(a))::BIGINT AS n_nulls, "
            "count(DISTINCT a)::BIGINT AS n_distinct, "
            "min(a)::DOUBLE AS min_value, max(a)::DOUBLE AS max_value FROM t "
            "UNION ALL SELECT 'b', count(*), count(*) - count(b), "
            "count(DISTINCT b), min(b)::DOUBLE, max(b)::DOUBLE FROM t "
            "UNION ALL SELECT 's', count(*), count(*) - count(s), "
            "count(DISTINCT s), NULL::DOUBLE, NULL::DOUBLE FROM t"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_all_null_column(self):
        tbl = pa.table({"a": pa.array([None, None], pa.int64())})
        got = profile_table(ray.data.from_arrow(tbl), ["a"]).to_pandas()
        row = got.iloc[0]
        assert row.n_rows == 2 and row.n_nulls == 2 and row.n_distinct == 0
        assert pd.isna(row.min_value) and pd.isna(row.max_value)

    def test_single_partition_distinct_exact(self):
        tbl = pa.table({"a": pa.array([1, 2, 3, 2, 1, None], pa.int64())})
        got = profile_table(
            ray.data.from_arrow(tbl), ["a"], num_partitions=1
        ).to_pandas()
        assert got.iloc[0].n_distinct == 3
