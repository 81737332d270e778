"""snapshot_diff: keyed added/removed/changed vs a DuckDB FULL OUTER JOIN."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from text_dedup_ray.pipelines.diff import snapshot_diff


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_diff_matches_full_outer_join():
    old = pa.table(
        {
            "k": pa.array(range(20), pa.int64()),
            "a": [f"v{i}" for i in range(20)],
            "b": pa.array([i * 1.5 for i in range(20)]),
        }
    )
    # drop k in {3, 7}; change k in {5, 10} (one per column); add 100, 101
    new_rows = []
    for i in range(20):
        if i in (3, 7):
            continue
        a = "CHANGED" if i == 5 else f"v{i}"
        b = -1.0 if i == 10 else i * 1.5
        new_rows.append({"k": i, "a": a, "b": b})
    new_rows += [{"k": 100, "a": "x", "b": 0.0}, {"k": 101, "a": "y", "b": 0.0}]
    new = pa.table(
        {
            "k": pa.array([r["k"] for r in new_rows], pa.int64()),
            "a": [r["a"] for r in new_rows],
            "b": pa.array([r["b"] for r in new_rows]),
        }
    )
    got = snapshot_diff(
        ray.data.from_arrow(old).repartition(3),
        ray.data.from_arrow(new).repartition(4),
        "k",
        ["a", "b"],
        num_partitions=4,
    ).to_pandas()
    con = duckdb.connect()
    con.register("old", old.to_pandas())
    con.register("new", new.to_pandas())
    want = con.execute(
        "SELECT coalesce(o.k, n.k) AS k, CASE "
        "WHEN o.k IS NULL THEN 'added' WHEN n.k IS NULL THEN 'removed' "
        "ELSE 'changed' END AS status "
        "FROM old o FULL OUTER JOIN new n ON o.k = n.k "
        "WHERE o.k IS NULL OR n.k IS NULL "
        "OR o.a IS DISTINCT FROM n.a OR o.b IS DISTINCT FROM n.b"
    ).df()
    pd.testing.assert_frame_equal(
        _canon(got).astype({"k": "int64"}), _canon(want).astype({"k": "int64"})
    )


def test_diff_identical_snapshots_is_empty():
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": ["a", "b", None]})
    out = snapshot_diff(
        ray.data.from_arrow(t), ray.data.from_arrow(t), "k", ["v"], num_partitions=2
    )
    assert out.count() == 0


def test_diff_null_vs_string_null_marker_distinct():
    old = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([None], pa.string())})
    new = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["\x01"], pa.string())})
    # NULL serializes distinctly from the literal marker char
    out = snapshot_diff(
        ray.data.from_arrow(old), ray.data.from_arrow(new), "k", ["v"], num_partitions=1
    ).to_pandas()
    assert len(out) == 1 and out["status"][0] == "changed"


def test_diff_empty_sides():
    t = pa.table({"k": pa.array([5, 6], pa.int64()), "v": ["a", "b"]})
    e = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
    added = snapshot_diff(
        ray.data.from_arrow(e), ray.data.from_arrow(t), "k", ["v"], num_partitions=2
    ).to_pandas()
    assert sorted(added["status"]) == ["added", "added"]
    removed = snapshot_diff(
        ray.data.from_arrow(t), ray.data.from_arrow(e), "k", ["v"], num_partitions=2
    ).to_pandas()
    assert sorted(removed["status"]) == ["removed", "removed"]


def test_diff_duplicate_key_raises():
    dup = pa.table({"k": pa.array([1, 1], pa.int64()), "v": ["a", "b"]})
    ok = pa.table({"k": pa.array([1], pa.int64()), "v": ["a"]})
    with pytest.raises(Exception, match="duplicate"):
        snapshot_diff(
            ray.data.from_arrow(dup),
            ray.data.from_arrow(ok),
            "k",
            ["v"],
            num_partitions=1,
        ).materialize()
