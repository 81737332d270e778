"""Sliding (hopping) event-time window aggregates."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.agg import sliding_window_agg


def _canon(df):
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(cols).reset_index(drop=True)


def _events(n=800, seed=5):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000  # us epoch
    ts = base + rng.integers(0, 86_400, n) * 1_000_000
    return pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": rng.choice(["a", "b"], n).tolist(),
            "value": np.round(rng.random(n), 3).tolist(),
        }
    )


ORACLE = (
    "SELECT event_type, make_timestamp("
    "(epoch_us(ts) // {h}) * {h} - i * {h}) AS window_start, "
    "round(sum(value), 3) AS sum_value, count(*)::BIGINT AS n "
    "FROM (SELECT event_type, value, ts, unnest(range({k})) AS i FROM t) "
    "GROUP BY event_type, window_start"
)


class TestSlidingWindow:
    def test_matches_duckdb(self):
        tbl = _events()
        got = sliding_window_agg(
            ray.data.from_arrow(tbl).repartition(4),
            "ts", "event_type", "value", window_s=3600, hop_s=900,
        ).to_pandas()
        got["sum_value"] = got["sum_value"].round(3)
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(ORACLE.format(h=900_000_000, k=4)).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_each_event_in_exactly_k_windows(self):
        tbl = pa.table(
            {
                "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
                "event_type": ["x"],
                "value": [1.0],
            }
        )
        got = sliding_window_agg(
            ray.data.from_arrow(tbl), "ts", "event_type", "value",
            window_s=3600, hop_s=900,
        ).to_pandas()
        assert len(got) == 4 and got.n.sum() == 4
        starts = sorted(got.window_start)
        deltas = np.diff([s.value for s in pd.to_datetime(starts)])
        assert (deltas == 900 * 1_000_000_000).all()

    def test_rejects_non_divisible(self):
        import pytest

        with pytest.raises(ValueError):
            sliding_window_agg(
                ray.data.from_arrow(_events(10)), "ts", "event_type",
                window_s=3600, hop_s=1000,
            )
