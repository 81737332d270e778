"""Joins family: as-of join, range join + aggregate, broadcast hash join.

Pure-numpy / brute-force references computed in-test; partition-count
invariance proves the exchange co-partitioning is correct (a key split
across partitions would silently lose matches)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.joins import asof_join, broadcast_join, range_join_agg

US = 1_000_000


def _ts(sec: list[int]) -> pa.Array:
    return pa.array(np.array(sec, dtype=np.int64) * US, pa.timestamp("us"))


def _left(ids, keys, ts_sec):
    return ray.data.from_arrow(
        pa.table({"lid": pa.array(ids, pa.int64()), "k": pa.array(keys, pa.int64()), "t": _ts(ts_sec)})
    )


def _right(ids, keys, ts_sec, vals=None):
    cols = {"rid": pa.array(ids, pa.int64()), "rk": pa.array(keys, pa.int64()), "rt": _ts(ts_sec)}
    if vals is not None:
        cols["v"] = pa.array(vals, pa.float64())
    return ray.data.from_arrow(pa.table(cols))


def _sorted_df(ds, by):
    df = ds.to_pandas()
    if df.empty:  # Ray's to_pandas drops columns on all-empty datasets
        return df
    return df.sort_values(by).reset_index(drop=True)


def _asof(left, right, parts=4):
    return _sorted_df(
        asof_join(
            left,
            right,
            left_key="k",
            right_key="rk",
            left_ts="t",
            right_ts="rt",
            tie_column="rid",
            left_columns=["lid"],
            right_columns=["rid"],
            num_partitions=parts,
        ),
        "lid",
    )


class TestAsofJoin:
    def test_interleaved_backward_match(self):
        # key 1: right at t=10,20,30 — probes pick the floor; key 2 has its own
        left = _left([0, 1, 2, 3, 4], [1, 1, 1, 1, 2], [5, 10, 25, 99, 50])
        right = _right([100, 101, 102, 200], [1, 1, 1, 2], [10, 20, 30, 40])
        out = _asof(left, right)
        # lid=0 (t=5) has no order <= 5 -> dropped (inner)
        assert out.lid.tolist() == [1, 2, 3, 4]
        assert out.rid.tolist() == [100, 101, 102, 200]

    def test_equal_ts_matches_and_tie_breaks_to_max_tie(self):
        left = _left([0], [7], [10])
        right = _right([5, 9, 3], [7, 7, 7], [10, 10, 8])
        out = _asof(left, right)
        assert out.rid.tolist() == [9]  # ts tie at 10 -> max rid wins

    def test_no_cross_key_bleed(self):
        left = _left([0], [1], [100])
        right = _right([50], [2], [10])  # other key only
        assert len(_asof(left, right)) == 0

    def test_partition_count_invariance(self):
        rng = np.random.default_rng(7)
        n_l, n_r = 500, 300
        left = _left(range(n_l), rng.integers(0, 20, n_l), rng.integers(0, 1000, n_l))
        right = _right(range(n_r), rng.integers(0, 20, n_r), rng.integers(0, 1000, n_r))
        a = _asof(left, right, parts=1)
        b = _asof(left, right, parts=13)
        pd.testing.assert_frame_equal(a, b)

    def test_matches_brute_force(self):
        rng = np.random.default_rng(11)
        n_l, n_r = 200, 150
        lk, lt = rng.integers(0, 8, n_l), rng.integers(0, 100, n_l)
        rk, rt = rng.integers(0, 8, n_r), rng.integers(0, 100, n_r)
        out = _asof(_left(range(n_l), lk, lt), _right(range(n_r), rk, rt))
        exp = {}
        for i in range(n_l):
            best = None
            for j in range(n_r):
                if rk[j] == lk[i] and rt[j] <= lt[i]:
                    cand = (rt[j], j)
                    if best is None or cand > best:
                        best = cand
            if best is not None:
                exp[i] = best[1]
        assert dict(zip(out.lid, out.rid)) == exp

    def test_empty_sides(self):
        left = _left([0], [1], [10])
        empty = _right([], [], [])
        assert len(_asof(left, empty)) == 0
        assert len(_asof(_left([], [], []), _right([1], [1], [5]))) == 0


class TestRangeJoinAgg:
    def _run(self, left, right, lo, hi, parts=4, **kw):
        return _sorted_df(
            range_join_agg(
                left,
                right,
                left_key="k",
                right_key="rk",
                left_ts="t",
                right_ts="rt",
                lo_us=lo * US,
                hi_us=hi * US,
                left_columns=["lid"],
                value_column="v",
                num_partitions=parts,
                **kw,
            ),
            "lid",
        )

    def test_window_boundaries_exclusive_lo_inclusive_hi(self):
        left = _left([0], [1], [100])
        right = _right([0, 1, 2, 3], [1] * 4, [100, 101, 160, 161], [1.0, 2.0, 4.0, 8.0])
        out = self._run(left, right, 0, 60)  # (100, 160]
        assert out.n_matches.tolist() == [2]  # 101 and 160; 100 excluded, 161 out
        assert out.sum_value.tolist() == [6.0]

    def test_inclusive_lo(self):
        left = _left([0], [1], [100])
        right = _right([0, 1], [1, 1], [100, 110], [1.0, 2.0])
        out = self._run(left, right, 0, 60, lo_inclusive=True)
        assert out.n_matches.tolist() == [2]

    def test_unmatched_dropped_or_kept(self):
        left = _left([0, 1], [1, 2], [100, 100])
        right = _right([0], [1], [110], [5.0])
        inner = self._run(left, right, 0, 60)
        assert inner.lid.tolist() == [0]
        outer = self._run(left, right, 0, 60, keep_unmatched=True)
        assert outer.lid.tolist() == [0, 1]
        assert outer.n_matches.tolist() == [1, 0]
        assert outer.sum_value.tolist() == [5.0, 0.0]

    def test_matches_brute_force(self):
        rng = np.random.default_rng(3)
        n_l, n_r = 300, 400
        lk, lt = rng.integers(0, 10, n_l), rng.integers(0, 500, n_l)
        rk, rt = rng.integers(0, 10, n_r), rng.integers(0, 500, n_r)
        rv = rng.normal(size=n_r).round(3)
        out = self._run(
            _left(range(n_l), lk, lt), _right(range(n_r), rk, rt, rv), 0, 50, parts=7
        )
        got = {int(r.lid): (int(r.n_matches), r.sum_value) for r in out.itertuples()}
        for i in range(n_l):
            m = (rk == lk[i]) & (rt > lt[i]) & (rt <= lt[i] + 50)
            if m.sum():
                n, s = got[i]
                assert n == m.sum()
                assert abs(s - rv[m].sum()) < 1e-9
            else:
                assert i not in got

    def test_partition_count_invariance(self):
        rng = np.random.default_rng(5)
        n = 400
        left = _left(range(n), rng.integers(0, 6, n), rng.integers(0, 300, n))
        right = _right(range(n), rng.integers(0, 6, n), rng.integers(0, 300, n), rng.normal(size=n))
        a = self._run(left, right, 0, 40, parts=1)
        b = self._run(left, right, 0, 40, parts=11)
        pd.testing.assert_frame_equal(a, b, rtol=1e-12)

    def test_empty_right(self):
        out = self._run(_left([0], [1], [10]), _right([], [], [], []), 0, 60)
        assert len(out) == 0


class TestBroadcastJoin:
    def _sides(self):
        big = ray.data.from_arrow(
            pa.table({"fk": pa.array([1, 2, 3, 2, 9], pa.int64()), "x": pa.array(list("abcde"))})
        )
        small = pa.table(
            {"pk": pa.array([1, 2, 3], pa.int64()), "name": pa.array(["one", "two", "three"])}
        )
        return big, small

    def test_inner(self):
        big, small = self._sides()
        out = (
            broadcast_join(big, small, left_on="fk", right_on="pk", right_columns=["name"])
            .to_pandas()
            .sort_values("x")
            .reset_index(drop=True)
        )
        assert out.x.tolist() == ["a", "b", "c", "d"]  # 'e' (fk=9) dropped
        assert out.name.tolist() == ["one", "two", "three", "two"]

    def test_left_null_fill(self):
        big, small = self._sides()
        out = (
            broadcast_join(
                big, small, left_on="fk", right_on="pk", right_columns=["name"], how="left"
            )
            .to_pandas()
            .sort_values("x")
            .reset_index(drop=True)
        )
        assert len(out) == 5
        assert out.name.isna().tolist() == [False, False, False, False, True]

    def test_duplicate_right_keys_first_wins(self):
        big = ray.data.from_arrow(pa.table({"fk": pa.array([1], pa.int64())}))
        small = pa.table({"pk": pa.array([1, 1], pa.int64()), "name": pa.array(["first", "second"])})
        out = broadcast_join(
            big, small, left_on="fk", right_on="pk", right_columns=["name"]
        ).to_pandas()
        assert out.name.tolist() == ["first"]

    def test_small_side_as_dataset_and_limit(self):
        big, small = self._sides()
        out = broadcast_join(
            big, ray.data.from_arrow(small), left_on="fk", right_on="pk", right_columns=["name"]
        ).to_pandas()
        assert len(out) == 4
        with pytest.raises(ValueError, match="small_limit"):
            broadcast_join(
                big, small, left_on="fk", right_on="pk", right_columns=["name"], small_limit=2
            )

    def test_empty_small_side(self):
        big, _ = self._sides()
        empty = pa.table({"pk": pa.array([], pa.int64()), "name": pa.array([], pa.string())})
        inner = broadcast_join(
            big, empty, left_on="fk", right_on="pk", right_columns=["name"]
        ).to_pandas()
        assert len(inner) == 0
        left = broadcast_join(
            big, empty, left_on="fk", right_on="pk", right_columns=["name"], how="left"
        ).to_pandas()
        assert len(left) == 5 and left.name.isna().all()


class TestBroadcastSemiAnti:
    def _sides(self):
        big = ray.data.from_arrow(
            pa.table({"fk": pa.array([1, 2, 3, 4, 5], pa.int64()),
                      "v": pa.array([10, 20, 30, 40, 50], pa.int64())})
        ).repartition(2)
        small = pa.table({"pk": pa.array([2, 4, 4], pa.int64())})
        return big, small

    def test_semi(self):
        big, small = self._sides()
        out = broadcast_join(
            big, small, left_on="fk", right_on="pk", how="semi"
        ).to_pandas().sort_values("fk")
        assert out.fk.tolist() == [2, 4]
        assert out.columns.tolist() == ["fk", "v"]  # pure filter, no columns added

    def test_anti(self):
        big, small = self._sides()
        out = broadcast_join(
            big, small, left_on="fk", right_on="pk", how="anti"
        ).to_pandas().sort_values("fk")
        assert out.fk.tolist() == [1, 3, 5]

    def test_anti_empty_small_keeps_all(self):
        big, _ = self._sides()
        empty = pa.table({"pk": pa.array([], pa.int64())})
        out = broadcast_join(big, empty, left_on="fk", right_on="pk", how="anti")
        assert out.count() == 5

    def test_inner_requires_right_columns(self):
        import pytest

        big, small = self._sides()
        with pytest.raises(ValueError):
            broadcast_join(big, small, left_on="fk", right_on="pk", how="inner")
