"""Per-key LAG/LEAD window stamping."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.agg import with_lag_lead


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


class TestLagLead:
    def test_matches_duckdb(self):
        rng = np.random.default_rng(19)
        n = 2000
        tbl = pa.table(
            {
                "uid": rng.integers(0, 60, n).tolist(),
                "eid": rng.permutation(n).tolist(),
                "v": np.round(rng.random(n), 3).tolist(),
            }
        )
        got = with_lag_lead(
            ray.data.from_arrow(tbl).repartition(5), "uid", "eid", "v",
            lags=(1, 2), leads=(1,), num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT uid, eid, v, "
            "lag(v, 1) OVER w AS lag_1, lag(v, 2) OVER w AS lag_2, "
            "lead(v, 1) OVER w AS lead_1 FROM t "
            "WINDOW w AS (PARTITION BY uid ORDER BY eid)"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_boundaries_null_and_tiny_groups(self):
        tbl = pa.table(
            {
                "uid": [1, 1, 1, 2],
                "eid": [10, 20, 30, 5],
                "v": [1.0, 2.0, 3.0, 9.0],
            }
        )
        got = (
            with_lag_lead(ray.data.from_arrow(tbl), "uid", "eid", "v",
                          lags=(1,), leads=(1,))
            .to_pandas()
            .sort_values(["uid", "eid"])
            .reset_index(drop=True)
        )
        assert got.lag_1.isna().tolist() == [True, False, False, True]
        assert got.lag_1.tolist()[1:3] == [1.0, 2.0]
        assert got.lead_1.isna().tolist() == [False, False, True, True]

    def test_partition_invariance(self):
        rng = np.random.default_rng(1)
        tbl = pa.table(
            {
                "uid": rng.integers(0, 5, 200).tolist(),
                "eid": rng.permutation(200).tolist(),
                "v": rng.random(200).tolist(),
            }
        )
        ds = ray.data.from_arrow(tbl)
        a = with_lag_lead(ds.repartition(1), "uid", "eid", "v", num_partitions=1).to_pandas()
        b = with_lag_lead(ds.repartition(7), "uid", "eid", "v", num_partitions=5).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))


class TestRunningSum:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.agg import with_running_sum

        rng = np.random.default_rng(27)
        n = 3000
        tbl = pa.table(
            {
                "uid": rng.integers(0, 40, n).tolist(),
                "eid": rng.permutation(n).tolist(),
                "v": np.round(rng.random(n) * 100, 3).tolist(),
            }
        )
        got = with_running_sum(
            ray.data.from_arrow(tbl).repartition(6), "uid", "eid", "v",
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT uid, eid, v, round(sum(v) OVER (PARTITION BY uid "
            "ORDER BY eid ROWS UNBOUNDED PRECEDING), 6) AS running_sum FROM t"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_restart_at_key_boundary(self):
        from text_dedup_ray.pipelines.agg import with_running_sum

        tbl = pa.table(
            {"uid": [1, 1, 2, 2], "eid": [1, 2, 1, 2], "v": [5.0, 5.0, 1.0, 1.0]}
        )
        got = (
            with_running_sum(ray.data.from_arrow(tbl), "uid", "eid", "v")
            .to_pandas()
            .sort_values(["uid", "eid"])
        )
        assert got.running_sum.tolist() == [5.0, 10.0, 1.0, 2.0]

    def test_negative_values_exact_prefix(self):
        # regression: a negative value makes the GLOBAL cumsum
        # non-monotonic, so forward-filling the per-key base with
        # maximum.accumulate silently corrupted every later key
        from text_dedup_ray.pipelines.agg import with_running_sum

        tbl = pa.table(
            {"uid": [1, 1, 2, 2], "eid": [1, 2, 1, 2], "v": [10.0, -20.0, 5.0, 5.0]}
        )
        got = (
            with_running_sum(ray.data.from_arrow(tbl), "uid", "eid", "v")
            .to_pandas()
            .sort_values(["uid", "eid"])
        )
        assert got.running_sum.tolist() == [10.0, -10.0, 5.0, 10.0]

    def test_negative_values_match_duckdb(self):
        from text_dedup_ray.pipelines.agg import with_running_sum

        rng = np.random.default_rng(41)
        n = 2000
        tbl = pa.table(
            {
                "uid": rng.integers(0, 30, n).tolist(),
                "eid": rng.permutation(n).tolist(),
                "v": np.round(rng.standard_normal(n) * 50, 3).tolist(),
            }
        )
        got = with_running_sum(
            ray.data.from_arrow(tbl).repartition(6), "uid", "eid", "v",
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT uid, eid, v, round(sum(v) OVER (PARTITION BY uid "
            "ORDER BY eid ROWS UNBOUNDED PRECEDING), 6) AS running_sum FROM t"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)


class TestRowNumber:
    def test_matches_duckdb_both_directions(self):
        from text_dedup_ray.pipelines.agg import with_row_number

        rng = np.random.default_rng(44)
        n = 1500
        tbl = pa.table(
            {
                "uid": rng.integers(0, 30, n).tolist(),
                "eid": rng.permutation(n).tolist(),
            }
        )
        con = duckdb.connect()
        con.register("t", tbl)
        for desc in (False, True):
            got = with_row_number(
                ray.data.from_arrow(tbl).repartition(4), "uid", "eid",
                descending=desc, num_partitions=5,
            ).to_pandas()
            d = "DESC" if desc else "ASC"
            exp = con.execute(
                f"SELECT uid, eid, row_number() OVER (PARTITION BY uid "
                f"ORDER BY eid {d})::BIGINT AS rn FROM t"
            ).fetchdf()
            pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_partition_invariance(self):
        from text_dedup_ray.pipelines.agg import with_row_number

        tbl = pa.table({"uid": [1, 1, 2], "eid": [5, 3, 9]})
        ds = ray.data.from_arrow(tbl)
        a = with_row_number(ds.repartition(1), "uid", "eid", num_partitions=1).to_pandas()
        b = with_row_number(ds.repartition(3), "uid", "eid", num_partitions=7).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))
        assert _canon(a).sort_values(["uid", "eid"]).rn.tolist() == [1, 2, 1]


class TestNtile:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.agg import with_row_number

        rng = np.random.default_rng(3)
        n = 1000
        tbl = pa.table(
            {
                "uid": rng.integers(0, 17, n).tolist(),  # uneven group sizes
                "eid": rng.permutation(n).tolist(),
            }
        )
        got = with_row_number(
            ray.data.from_arrow(tbl).repartition(4), "uid", "eid",
            ntile=4, num_partitions=5,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT uid, eid, row_number() OVER w::BIGINT AS rn, "
            "ntile(4) OVER w::BIGINT AS tile FROM t "
            "WINDOW w AS (PARTITION BY uid ORDER BY eid)"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_group_smaller_than_n(self):
        from text_dedup_ray.pipelines.agg import with_row_number

        tbl = pa.table({"uid": [1, 1], "eid": [1, 2]})
        got = (
            with_row_number(ray.data.from_arrow(tbl), "uid", "eid", ntile=5)
            .to_pandas()
            .sort_values("eid")
        )
        assert got.tile.tolist() == [1, 2]


class TestDebounceEvents:
    def test_lag_window_semantics_and_boundary(self):
        import datetime as dt

        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.agg import debounce_events

        t0 = dt.datetime(2026, 1, 1)

        def ts(sec):
            return t0 + dt.timedelta(seconds=sec)

        rows = [
            # user 1 / click: repeats at +0, +10 (suppressed), +3600 (== window,
            # suppressed: strict >), +3601+3600 -> kept
            (1, 1, "click", ts(0)),
            (2, 1, "click", ts(10)),
            (3, 1, "click", ts(10 + 3600)),
            (4, 1, "click", ts(10 + 3600 + 3601)),
            # same user, other type: independent
            (5, 1, "view", ts(5)),
            # other user, same type: independent
            (6, 2, "click", ts(6)),
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            }
        )
        out = debounce_events(
            ray.data.from_arrow(tbl).repartition(3), window_seconds=3600
        ).to_pandas()
        assert sorted(out["event_id"]) == [1, 4, 5, 6]

    def test_identical_timestamps_keep_min_id(self):
        import datetime as dt

        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.agg import debounce_events

        t = dt.datetime(2026, 1, 1)
        tbl = pa.table(
            {
                "event_id": pa.array([7, 3, 5], pa.int64()),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_type": pa.array(["x", "x", "x"]),
                "ts": pa.array([t, t, t], pa.timestamp("us")),
            }
        )
        out = debounce_events(ray.data.from_arrow(tbl), window_seconds=60).to_pandas()
        assert sorted(out["event_id"]) == [3]
