"""Event-sequence analytics: transitions, funnel, decayed sum, moving
average, rollup — DuckDB window/ROLLUP parity plus edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.sequence import (
    decayed_sum,
    funnel_counts,
    moving_avg,
    rollup_counts,
    transition_counts,
)


def _canon(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


def _events(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    return pa.table(
        {
            "uid": rng.integers(0, 80, n).tolist(),
            "eid": rng.permutation(n).tolist(),
            "ts": (base + rng.integers(0, 10**9, n).astype("timedelta64[us]")),
            "etype": rng.choice(["a", "b", "c", "d"], n).tolist(),
            "v": np.round(rng.normal(10, 40, n), 3).tolist(),  # negatives too
        }
    )


class TestTransitions:
    def test_matches_duckdb(self):
        tbl = _events()
        got = transition_counts(
            ray.data.from_arrow(tbl).repartition(5),
            "uid", ("ts", "eid"), "etype", num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH nx AS (SELECT etype AS src, lead(etype) OVER "
            "(PARTITION BY uid ORDER BY ts, eid) AS dst FROM t) "
            "SELECT src, dst, count(*)::BIGINT AS n FROM nx "
            "WHERE dst IS NOT NULL GROUP BY src, dst"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_null_states_dropped_before_pairing(self):
        # NULL states never form transitions (docstring contract): the
        # engine matches SQL with "WHERE etype IS NOT NULL" BEFORE the
        # window, so a->NULL->b yields the a->b transition
        tbl = pa.table(
            {
                "uid": [1, 1, 1, 2, 2],
                "eid": [1, 2, 3, 4, 5],
                "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("us")),
                "etype": ["a", None, "b", None, "c"],
            }
        )
        got = transition_counts(
            ray.data.from_arrow(tbl).repartition(3),
            "uid", ("ts", "eid"), "etype", num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH f AS (SELECT * FROM t WHERE etype IS NOT NULL), "
            "nx AS (SELECT etype AS src, lead(etype) OVER "
            "(PARTITION BY uid ORDER BY ts, eid) AS dst FROM f) "
            "SELECT src, dst, count(*)::BIGINT AS n FROM nx "
            "WHERE dst IS NOT NULL GROUP BY src, dst"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)
        assert got.n.sum() == 1  # exactly the a->b pair; uid 2 has one state

    def test_single_event_keys_emit_nothing(self):
        tbl = pa.table(
            {
                "uid": [1, 2, 3],
                "eid": [1, 2, 3],
                "ts": pa.array([1, 2, 3], pa.timestamp("us")),
                "etype": ["a", "b", "a"],
            }
        )
        got = transition_counts(
            ray.data.from_arrow(tbl), "uid", ("ts", "eid"), "etype"
        ).to_pandas()
        assert len(got) == 0


class TestFunnel:
    def test_matches_duckdb_chained(self):
        tbl = _events()
        got = funnel_counts(
            ray.data.from_arrow(tbl).repartition(4),
            "uid", "ts", "etype", ("a", "b", "c"),
            tiebreak_column="eid", num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH s1 AS (SELECT uid, min(ts) AS t FROM t WHERE etype='a' GROUP BY uid), "
            "s2 AS (SELECT e.uid, min(e.ts) AS t FROM t e JOIN s1 USING (uid) "
            "WHERE e.etype='b' AND e.ts > s1.t GROUP BY e.uid), "
            "s3 AS (SELECT e.uid, min(e.ts) AS t FROM t e JOIN s2 USING (uid) "
            "WHERE e.etype='c' AND e.ts > s2.t GROUP BY e.uid) "
            "SELECT 1::BIGINT AS step, 'a' AS etype, count(*)::BIGINT AS n_keys FROM s1 "
            "UNION ALL SELECT 2, 'b', count(*) FROM s2 "
            "UNION ALL SELECT 3, 'c', count(*) FROM s3"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)
        assert got.sort_values("step").n_keys.is_monotonic_decreasing

    def test_strict_order_required(self):
        # user did b BEFORE a only -> completes step 1 (a) but not step 2
        ts = pa.array([1, 2], pa.timestamp("us"))
        tbl = pa.table({"uid": [1, 1], "eid": [1, 2], "ts": ts, "etype": ["b", "a"]})
        got = (
            funnel_counts(ray.data.from_arrow(tbl), "uid", "ts", "etype", ("a", "b"))
            .to_pandas()
            .sort_values("step")
        )
        assert got.n_keys.tolist() == [1, 0]


class TestDecayedSum:
    def test_matches_duckdb(self):
        tbl = _events()
        cutoff = int(pd.Timestamp("2024-03-20").value // 1000)
        hl = 5 * 86400.0
        got = decayed_sum(
            ray.data.from_arrow(tbl).repartition(5), "uid", "ts", "v",
            cutoff, hl, num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            f"SELECT uid, round(sum(v * power(2.0, "
            f"-(({cutoff} - epoch_us(ts)) / ({hl} * 1000000)))), 4) "
            f"AS decayed_value FROM t GROUP BY uid"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)


class TestMovingAvg:
    def test_matches_duckdb(self):
        tbl = _events()
        got = moving_avg(
            ray.data.from_arrow(tbl).repartition(5), "uid", "eid", "v",
            window_rows=4, num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT uid, eid, v, round(avg(v) OVER (PARTITION BY uid "
            "ORDER BY eid ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) "
            "AS moving_avg FROM t"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_window_one_is_identity(self):
        tbl = pa.table({"uid": [1, 1, 2], "eid": [1, 2, 3], "v": [3.0, 5.0, 7.0]})
        got = moving_avg(ray.data.from_arrow(tbl), "uid", "eid", "v", 1).to_pandas()
        assert got.sort_values("eid").moving_avg.tolist() == [3.0, 5.0, 7.0]


class TestRollup:
    def test_matches_duckdb_rollup(self):
        tbl = _events()

        def d_type(b):
            return np.asarray([str(x) for x in b["etype"].to_pylist()], object)

        def d_hour(b):
            tsi = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
            )
            return ((tsi // 3_600_000_000) % 24).astype(str).astype(object)

        got = rollup_counts(
            ray.data.from_arrow(tbl).repartition(5),
            {"etype": d_type, "hour": d_hour}, "v",
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT coalesce(etype, 'ALL') AS etype, "
            "coalesce(CAST(hour AS VARCHAR), 'ALL') AS hour, "
            "count(*)::BIGINT AS n, round(sum(v), 3) AS sum_value "
            "FROM (SELECT etype, extract(hour FROM ts)::BIGINT AS hour, v FROM t) "
            "GROUP BY ROLLUP(etype, hour)"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)


class TestCohortRetention:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.sequence import cohort_retention

        tbl = _events()
        got = cohort_retention(
            ray.data.from_arrow(tbl).repartition(5), "uid", "ts",
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH f AS (SELECT uid, min(CAST(ts AS DATE)) AS cohort FROM t GROUP BY uid), "
            "e AS (SELECT t.uid, f.cohort, date_diff('day', f.cohort, CAST(t.ts AS DATE)) AS off "
            "FROM t JOIN f USING (uid)) "
            "SELECT CAST(cohort AS VARCHAR) AS cohort_day, off::BIGINT AS day_offset, "
            "count(DISTINCT uid)::BIGINT AS n_keys FROM e GROUP BY 1, 2"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_day_zero_covers_every_key(self):
        from text_dedup_ray.pipelines.sequence import cohort_retention

        tbl = _events(500)
        got = cohort_retention(ray.data.from_arrow(tbl), "uid", "ts").to_pandas()
        n_keys_day0 = got[got.day_offset == 0].n_keys.sum()
        assert n_keys_day0 == len(np.unique(tbl["uid"].to_numpy()))


class TestMadOutliers:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.agg import grouped_mad_outliers

        tbl = _events()
        got = grouped_mad_outliers(
            ray.data.from_arrow(tbl).repartition(5), "etype", "eid", "v",
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH m AS (SELECT etype, median(v) AS med FROM t GROUP BY etype), "
            "d AS (SELECT t.eid, t.etype, t.v, abs(t.v - m.med) AS ad "
            "FROM t JOIN m USING (etype)), "
            "m2 AS (SELECT etype, median(ad) AS mad FROM d GROUP BY etype) "
            "SELECT d.eid, d.etype, d.v, d.ad > 3.0 * m2.mad AS is_outlier "
            "FROM d JOIN m2 USING (etype)"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_extreme_value_flagged_mean_would_mask(self):
        from text_dedup_ray.pipelines.agg import grouped_mad_outliers

        v = [10.0, 11.0, 9.0, 10.5, 9.5, 1000.0]
        tbl = pa.table({"g": ["a"] * 6, "i": list(range(6)), "v": v})
        got = grouped_mad_outliers(
            ray.data.from_arrow(tbl), "g", "i", "v"
        ).to_pandas()
        assert bool(got[got.i == 5].is_outlier.iloc[0])
        assert not got[got.i != 5].is_outlier.any()


class TestGlobalRank:
    def test_matches_row_number(self):
        from text_dedup_ray.pipelines.pack import global_rank

        rng = np.random.default_rng(5)
        keys = rng.permutation(5000).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"key": keys})).repartition(7)
        got = global_rank(ds, "key", num_partitions=5).to_pandas()
        got = got.sort_values("key").reset_index(drop=True)
        assert (got["rank"].to_numpy() == got["key"].to_numpy() + 1).all()

    def test_empty(self):
        from text_dedup_ray.pipelines.pack import global_rank

        ds = ray.data.from_arrow(pa.table({"key": pa.array([], pa.int64())}))
        assert global_rank(ds, "key").count() == 0


class TestGapsAndLastSeen:
    def test_gaps_match_duckdb(self):
        from text_dedup_ray.pipelines.sequence import inter_event_gaps

        tbl = _events()
        got = inter_event_gaps(
            ray.data.from_arrow(tbl).repartition(4), "uid", "ts", "eid",
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH g AS (SELECT uid, epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY uid ORDER BY ts, eid) AS gap_us FROM t) "
            "SELECT uid, gap_us FROM g WHERE gap_us IS NOT NULL"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_last_seen_flags(self):
        from text_dedup_ray.pipelines.sequence import last_seen

        ts = pa.array(
            [np.datetime64("2024-01-01T00:00:00", "us"),
             np.datetime64("2024-01-20T00:00:00", "us"),
             np.datetime64("2024-01-02T00:00:00", "us")],
        )
        tbl = pa.table({"uid": [1, 1, 2], "ts": ts})
        cutoff = int(pd.Timestamp("2024-01-10").value // 1000)
        got = (
            last_seen(ray.data.from_arrow(tbl), "uid", "ts", churn_cutoff_us=cutoff)
            .to_pandas().sort_values("uid").reset_index(drop=True)
        )
        assert got.is_churned.tolist() == [False, True]


class TestFunnelDurations:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.sequence import funnel_durations

        tbl = _events()
        got = funnel_durations(
            ray.data.from_arrow(tbl).repartition(4), "uid", "ts", "etype",
            ("a", "b", "c"), num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH s1 AS (SELECT uid, min(ts) AS t FROM t WHERE etype='a' GROUP BY uid), "
            "s2 AS (SELECT e.uid, min(e.ts) AS t FROM t e JOIN s1 USING (uid) "
            "WHERE e.etype='b' AND e.ts > s1.t GROUP BY e.uid), "
            "s3 AS (SELECT e.uid, min(e.ts) AS t FROM t e JOIN s2 USING (uid) "
            "WHERE e.etype='c' AND e.ts > s2.t GROUP BY e.uid) "
            "SELECT s1.uid, (epoch_us(s3.t) - epoch_us(s1.t)) // 1000000 "
            "AS duration_s FROM s1 JOIN s3 USING (uid)"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_incomplete_keys_absent(self):
        from text_dedup_ray.pipelines.sequence import funnel_durations

        ts = pa.array([1_000_000, 2_000_000, 3_000_000], pa.timestamp("us"))
        tbl = pa.table({"uid": [1, 1, 2], "ts": ts, "etype": ["a", "b", "a"]})
        got = funnel_durations(
            ray.data.from_arrow(tbl), "uid", "ts", "etype", ("a", "b")
        ).to_pandas()
        assert got.uid.tolist() == [1] and got.duration_s.tolist() == [1]


class TestPeakConcurrency:
    def test_matches_bruteforce(self):
        from text_dedup_ray.pipelines.sequence import peak_concurrency

        rng = np.random.default_rng(8)
        n = 2000
        s = rng.integers(0, 10**7, n)
        e = s + rng.integers(1, 10**6, n)
        tbl = pa.table(
            {
                "s": pa.array(s.astype("datetime64[us]")),
                "e": pa.array(e.astype("datetime64[us]")),
            }
        )
        got = peak_concurrency(
            ray.data.from_arrow(tbl).repartition(5), "s", "e", num_partitions=4
        ).to_pandas()
        pts = sorted(
            [(t, 1) for t in s] + [(t, -1) for t in e], key=lambda p: (p[0], p[1])
        )
        run = peak = 0
        for _, d in pts:
            run += d
            peak = max(peak, run)
        assert got.iloc[0].peak_concurrency == peak

    def test_end_exclusive_ties(self):
        from text_dedup_ray.pipelines.sequence import peak_concurrency

        # [0, 10) and [10, 20): never concurrent
        tbl = pa.table(
            {
                "s": pa.array(np.array([0, 10], "datetime64[us]")),
                "e": pa.array(np.array([10, 20], "datetime64[us]")),
            }
        )
        got = peak_concurrency(ray.data.from_arrow(tbl), "s", "e").to_pandas()
        assert got.iloc[0].peak_concurrency == 1

    def test_empty(self):
        from text_dedup_ray.pipelines.sequence import peak_concurrency

        tbl = pa.table(
            {
                "s": pa.array([], pa.timestamp("us")),
                "e": pa.array([], pa.timestamp("us")),
            }
        )
        got = peak_concurrency(ray.data.from_arrow(tbl), "s", "e").to_pandas()
        assert got.iloc[0].peak_concurrency == 0


class TestDenseHourly:
    def test_gaps_filled_and_sums_match(self):
        from text_dedup_ray.pipelines.sequence import dense_hourly_counts

        # two clusters of events with a 10-hour silent gap between them
        base = np.datetime64("2024-05-01T00:30:00", "us")
        ts = np.concatenate(
            [base + np.arange(5).astype("timedelta64[h]"),
             base + (np.arange(3) + 15).astype("timedelta64[h]")]
        )
        tbl = pa.table({"ts": pa.array(ts.astype("datetime64[us]"))})
        got = dense_hourly_counts(
            ray.data.from_arrow(tbl).repartition(3), "ts"
        ).to_pandas().sort_values("hour").reset_index(drop=True)
        assert len(got) == 18  # hours 0..17 inclusive
        assert got.n.sum() == 8
        assert (got.n.iloc[5:15] == 0).all()  # the silent gap
