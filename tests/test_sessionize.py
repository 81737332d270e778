"""Gap-based sessionization (pipelines/agg.sessionize): planted sessions,
boundary gap semantics (gap == threshold joins; gap > threshold splits),
value sums, single-event users, and empty input."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.agg import sessionize

T0 = dt.datetime(2025, 1, 1, 12, 0, 0)


def _events(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([T0 + dt.timedelta(seconds=r[1]) for r in rows],
                           pa.timestamp("us")),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
        }
    )


class TestSessionize:
    def test_planted_sessions(self):
        rows = [
            # user 1: [0, 600, 2400] with gap=1800 -> 600->2400 gap exactly
            # 1800 JOINS; then 9000 splits (gap 6600)
            (1, 0, 1.0), (1, 600, 2.0), (1, 2400, 3.0), (1, 9000, 4.0),
            # user 2: single event
            (2, 100, 5.0),
            # user 3: two sessions split by a 1801-second gap
            (3, 0, 1.5), (3, 1801, 2.5),
        ]
        ds = ray.data.from_arrow(_events(rows)).repartition(3)
        out = (
            sessionize(ds, gap_seconds=1800, value_column="value", num_partitions=4)
            .to_pandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        got = [
            (int(r.user_id), int(r.n_events), float(r.sum_value))
            for r in out.itertuples()
        ]
        assert got == [
            (1, 3, 6.0), (1, 1, 4.0),
            (2, 1, 5.0),
            (3, 1, 1.5), (3, 1, 2.5),
        ]
        u1 = out[out.user_id == 1].iloc[0]
        assert u1.session_start == np.datetime64(T0)
        assert u1.session_end == np.datetime64(T0 + dt.timedelta(seconds=2400))

    def test_empty(self):
        ds = ray.data.from_arrow(_events([]))
        out = sessionize(ds, gap_seconds=1800, num_partitions=2)
        assert out.count() == 0
