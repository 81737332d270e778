"""Pre-aggregated grouped aggregates + tumbling-window aggregates.

The scale rule (SURVEY §4, ray_guide "Aggregation at scale"): never ship raw
rows into a ``groupby`` — combine per block first (one row per key per
block), then shuffle only the partials. ``grouped_sum_count`` implements the
partial/combiner pattern generically; ``tumbling_window_agg`` applies it to
event-time windows (Ray Data has no native windowing: the window key is
computed per batch with ``pyarrow.compute.floor_temporal``; ordering within a
window is irrelevant for the supported associative aggregates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def grouped_sum_count(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_columns: list[str],
    count_alias: str = "n",
) -> ray.data.Dataset:
    """groupby(keys) with COUNT(*) + SUM(cols), pre-aggregated per block."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = keys + sum_columns
        tbl = batch.select(cols)
        # within-block combine via pyarrow's hash aggregation
        out = tbl.group_by(keys).aggregate(
            [(c, "sum") for c in sum_columns] + [(keys[0], "count")]
        )
        renames = {f"{c}_sum": f"__p_{c}" for c in sum_columns}
        renames[f"{keys[0]}_count"] = "__p_n"
        return out.rename_columns([renames.get(c, c) for c in out.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    aggs = [Sum(f"__p_{c}", alias_name=c) for c in sum_columns]
    aggs.append(Sum("__p_n", alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def tumbling_window_agg(
    ds: ray.data.Dataset,
    ts_column: str,
    key_column: str,
    value_column: str | None = None,
    window: str = "hour",
    window_alias: str = "window_start",
) -> ray.data.Dataset:
    """Tumbling event-time windows: (key, floor(ts, window)) -> count [+ sum].

    ``window`` is a pyarrow floor_temporal unit ('minute', 'hour', 'day').
    """

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_column], unit=window)
        return batch.append_column(window_alias, w)

    windowed = ds.map_batches(add_window, batch_format="pyarrow")
    sums = [value_column] if value_column else []
    return grouped_sum_count(windowed, [key_column, window_alias], sums)


def sessionize(
    ds: ray.data.Dataset,
    ts_column: str = "ts",
    key_column: str = "user_id",
    gap_seconds: int = 1800,
    value_column: str | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Gap-based session windows: one output row per (key, session) with
    ``session_start`` / ``session_end`` / ``n_events`` [+ ``sum_value``] —
    a new session starts when a key's inter-event gap exceeds
    ``gap_seconds``.

    Ray Data has no session windowing; a ``groupby(key).map_groups`` would
    pay a sort-based shuffle (the repo's measured 24x-slower path), so this
    routes through the explicit hash exchange: events co-locate by
    ``hash(key)``, and one vectorized kernel per partition sorts (key, ts)
    once and derives session ids with a cumulative-sum over gap breaks —
    no per-row Python, no global sort. Partitioning assumption: a key's
    events fit one partition (same contract as any per-key window)."""
    from ..stages.exchange import hash_partition_exchange

    cols = [key_column, ts_column] + ([value_column] if value_column else [])

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        key = t[key_column].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (np.abs(key) % num_partitions).astype(np.int64)
        return t.append_column("part", pa.array(part))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def build_sessions(group: pa.Table) -> pa.Table:
        out_cols = {
            key_column: pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "session_end": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
        }
        if value_column:
            out_cols["sum_value"] = pa.array([], pa.float64())
        if group.num_rows == 0 or key_column not in group.column_names:
            return pa.table(out_cols)
        key = group[key_column].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group[ts_column].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts_us, key))
        k_s, t_s = key[order], ts_us[order]
        gap_us = np.int64(gap_seconds) * np.int64(1_000_000)
        brk = np.r_[True, (np.diff(k_s) != 0) | (np.diff(t_s) > gap_us)]
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(k_s)]
        n = (ends - starts).astype(np.int64)
        out = {
            key_column: k_s[starts],
            "session_start": t_s[starts].astype("datetime64[us]"),
            "session_end": t_s[ends - 1].astype("datetime64[us]"),
            "n_events": n,
        }
        if value_column:
            val = group[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
            out["sum_value"] = np.add.reduceat(val[order], starts)
        return pa.table(out)

    return hash_partition_exchange(tagged, "part", num_partitions, build_sessions)
