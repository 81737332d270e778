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
