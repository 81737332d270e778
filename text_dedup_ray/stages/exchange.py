"""Explicit two-phase hash-partitioned exchange (map-side split + reduce).

Ray Data's ``groupby(part).map_groups`` implements the rep-merge exchange as
a full sort-based shuffle — measured 184 s for 12.5M representative rows at
400k docs (the sort dominates everything else in the flagship); the 2.49
HASH_SHUFFLE strategy is faster but delivers groups to ``map_groups`` in
per-batch pieces, which silently breaks whole-group kernels.

This module drops to raw Ray tasks for exactly this step (SURVEY §7: raw
tasks only where the Dataset API can't express the need — here: a hash
exchange without a sort):

- split tasks: one per input block, ``num_returns=P`` — each returns its
  block's rows bucketed by ``hash(part) % P`` (vectorized ``np.argsort`` +
  slice; no Python per-row work);
- reduce tasks: one per partition, receiving that partition's sub-tables
  from every block (Ray moves only the needed objects) and applying the
  caller's vectorized kernel to the concatenated partition.

The result is wrapped back into a Dataset with ``from_arrow_refs`` — the
surrounding pipeline stays a Dataset pipeline. Objects never touch the
driver. On a multi-node cluster this is the same data movement a shuffle
performs (every sub-table crosses the store once), minus the sort.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _split_block(block: pa.Table, part_col: str, num_partitions: int) -> list[pa.Table]:
    if block.num_rows == 0:  # Ray emits schema-less empty blocks sometimes
        return [block] * num_partitions
    part = block[part_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    bounds = np.searchsorted(sorted_part, np.arange(num_partitions + 1))
    sorted_tbl = block.take(pa.array(order))
    return [
        sorted_tbl.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
        for p in range(num_partitions)
    ]


def hash_partition_exchange(
    ds: ray.data.Dataset,
    part_col: str,
    num_partitions: int,
    reduce_fn: Callable[[pa.Table], pa.Table],
    reduce_num_cpus: float = 1.0,
) -> ray.data.Dataset:
    """Apply ``reduce_fn`` once per hash partition of ``ds`` (the partition
    arrives as ONE concatenated Arrow table — whole-group semantics)."""

    split = ray.remote(num_returns=num_partitions)(_split_block)
    reduce_remote = ray.remote(num_cpus=reduce_num_cpus)(_reduce_partition)

    block_refs = ds.to_arrow_refs()
    if not block_refs:
        empty = reduce_fn(pa.table({part_col: pa.array([], pa.int64())}))
        return ray.data.from_arrow(empty)

    columns: list[list[ray.ObjectRef]] = [[] for _ in range(num_partitions)]
    for ref in block_refs:
        outs = split.remote(ref, part_col, num_partitions)
        if num_partitions == 1:
            outs = [outs]
        for p, o in enumerate(outs):
            columns[p].append(o)

    reduced = [reduce_remote.remote(reduce_fn, *columns[p]) for p in range(num_partitions)]
    return ray.data.from_arrow_refs(reduced)


def _reduce_partition(reduce_fn, *tables: pa.Table) -> pa.Table:
    parts = [t for t in tables if t.num_rows > 0]
    if not parts:
        return reduce_fn(tables[0]) if tables else pa.table({})
    return reduce_fn(pa.concat_tables(parts))
