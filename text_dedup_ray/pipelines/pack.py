"""Sequence packing (concat-and-chunk) — the step between a curated corpus
and a pretraining data loader: lay every document's tokens end-to-end in a
deterministic order and cut fixed-capacity training sequences, so each doc
gets a global token OFFSET and the context-window bins it lands in.

The hard part at 100 TB is the global EXCLUSIVE PREFIX SUM of token counts
in document order. This module implements it Ray-native in three narrow
passes (payload text never moves, nothing corpus-sized reaches the driver):

1. boundary sample — every block emits a handful of evenly-spaced order
   keys; the driver picks P-1 range boundaries from the pooled sample
   (classic sample-based range partitioning; skewed samples only unbalance
   partitions, never correctness);
2. partition totals — a stateless pass stamps each row's range partition
   (broadcast boundaries + ``searchsorted``) and folds one (partition,
   token-count sum) integer per block; the driver exclusive-scans the P
   totals into base offsets (P numbers, not rows);
3. offsets — one range exchange co-locates each partition, sorts it by the
   order key (a partition is a contiguous KEY RANGE, so local order IS
   global order), and emits ``base[p] + local exclusive cumsum`` per row.

Offsets are exact int64, so the SQL oracle (``sum(...) OVER (ORDER BY id
ROWS UNBOUNDED PRECEDING)``) hash-matches exactly. ``pack_sequences``
derives the training-relevant columns: first/last bin of each doc and
whether it straddles a sequence boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import hash_partition_exchange


def _order_vals(batch: pa.Table, col: str) -> np.ndarray:
    return batch[col].to_numpy(zero_copy_only=False)


def global_prefix_sum(
    ds: ray.data.Dataset,
    order_column: str,
    value_column: str,
    alias: str = "offset",
    num_partitions: int = 16,
    samples_per_block: int = 32,
) -> ray.data.Dataset:
    """Stamp each row with the exclusive prefix sum of ``value_column``
    over ``order_column`` order (ties impossible: the order key must be
    unique, e.g. a row id). Returns (order_column, value_column, alias)."""

    # ---- pass 1: sample order keys, derive range boundaries
    def sample(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        v = np.sort(_order_vals(batch, order_column).astype(np.int64))
        step = max(1, len(v) // samples_per_block)
        return pa.table({"k": pa.array(v[::step][:samples_per_block])})

    pool_df = ds.map_batches(
        sample, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    pool = (
        np.sort(pool_df["k"].to_numpy())
        if "k" in pool_df.columns
        else np.array([], np.int64)
    )
    if len(pool) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    order_column: pa.array([], pa.int64()),
                    value_column: pa.array([], pa.int64()),
                    alias: pa.array([], pa.int64()),
                }
            )
        )
    cuts = np.unique(
        pool[np.linspace(0, len(pool) - 1, num_partitions + 1).astype(int)][1:-1]
    )
    bounds_ref = ray.put(cuts)

    def stamp_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    order_column: pa.array([], pa.int64()),
                    value_column: pa.array([], pa.int64()),
                    "__rp": pa.array([], pa.int64()),
                }
            )
        b = ray.get(bounds_ref) if isinstance(bounds_ref, ray.ObjectRef) else bounds_ref
        k = _order_vals(batch, order_column).astype(np.int64)
        part = np.searchsorted(b, k, side="right").astype(np.int64)
        return pa.table(
            {
                order_column: batch[order_column].combine_chunks(),
                value_column: batch[value_column].combine_chunks(),
                "__rp": pa.array(part),
            }
        )

    slim = ds.select_columns([order_column, value_column]).map_batches(
        stamp_part, batch_format="pyarrow", batch_size=None
    )

    # ---- pass 2: per-partition totals -> exclusive base offsets (P ints)
    def totals(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"__rp": pa.array([], pa.int64()), "t": pa.array([], pa.int64())}
            )
        p = batch["__rp"].to_numpy(zero_copy_only=False)
        v = batch[value_column].to_numpy(zero_copy_only=False).astype(np.int64)
        acc = np.zeros(len(cuts) + 1, np.int64)
        np.add.at(acc, p, v)
        nz = np.flatnonzero(acc)
        return pa.table({"__rp": pa.array(nz.astype(np.int64)), "t": pa.array(acc[nz])})

    tot = slim.map_batches(totals, batch_format="pyarrow", batch_size=None).to_pandas()
    per_part = np.zeros(len(cuts) + 1, np.int64)
    if len(tot):
        np.add.at(per_part, tot["__rp"].to_numpy(), tot["t"].to_numpy())
    base = np.concatenate(([0], np.cumsum(per_part)[:-1]))
    base_ref = ray.put(base)

    # ---- pass 3: range exchange + in-partition exclusive cumsum
    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                order_column: pa.array([], pa.int64()),
                value_column: pa.array([], pa.int64()),
                alias: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or order_column not in group.column_names:
            return empty
        bb = ray.get(base_ref) if isinstance(base_ref, ray.ObjectRef) else base_ref
        k = _order_vals(group, order_column).astype(np.int64)
        v = group[value_column].to_numpy(zero_copy_only=False).astype(np.int64)
        p = int(group["__rp"][0].as_py())
        order = np.argsort(k, kind="stable")
        csum = np.zeros(len(k), np.int64)
        csum[order[1:]] = np.cumsum(v[order])[:-1]
        csum += bb[p]
        return pa.table(
            {
                order_column: group[order_column].combine_chunks(),
                value_column: group[value_column].combine_chunks(),
                alias: pa.array(csum),
            }
        )

    return hash_partition_exchange(slim, "__rp", len(cuts) + 1, fold)


def pack_sequences(
    ds: ray.data.Dataset,
    token_count_column: str,
    id_column: str = "doc_id",
    capacity: int = 2048,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Concat-and-chunk packing plan: ``(id, n, offset, first_bin,
    last_bin, straddles)`` — which fixed-``capacity`` training sequences
    each doc occupies when all docs are laid end-to-end in id order.
    Zero-token docs occupy no bin (first_bin = last_bin = the bin of
    their offset, straddles false)."""
    stamped = global_prefix_sum(
        ds,
        id_column,
        token_count_column,
        alias="offset",
        num_partitions=num_partitions,
    )

    def bins(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    token_count_column: pa.array([], pa.int64()),
                    "offset": pa.array([], pa.int64()),
                    "first_bin": pa.array([], pa.int64()),
                    "last_bin": pa.array([], pa.int64()),
                    "straddles": pa.array([], pa.bool_()),
                }
            )
        off = batch["offset"].to_numpy(zero_copy_only=False)
        n = batch[token_count_column].to_numpy(zero_copy_only=False)
        first = off // capacity
        last = np.where(n > 0, (off + n - 1) // capacity, first)
        return pa.table(
            {
                id_column: batch[id_column].combine_chunks(),
                token_count_column: batch[token_count_column].combine_chunks(),
                "offset": batch["offset"].combine_chunks(),
                "first_bin": pa.array(first.astype(np.int64)),
                "last_bin": pa.array(last.astype(np.int64)),
                "straddles": pa.array(last > first),
            }
        )

    return stamped.map_batches(bins, batch_format="pyarrow", batch_size=None)


def global_rank(
    ds: ray.data.Dataset,
    key_column: str,
    alias: str = "rank",
    num_partitions: int = 16,
    samples_per_block: int = 32,
) -> ray.data.Dataset:
    """Global 1-based dense ordering rank over a UNIQUE int64 sort key —
    the distributed ``row_number() OVER (ORDER BY key)`` (TPC-style
    global sort): rank = exclusive prefix-COUNT over key order + 1,
    computed by :func:`global_prefix_sum` with value=1 (sample-based
    range partitioning, P partition totals to the driver, one range
    exchange). Composite orderings encode into the int64 key (e.g.
    ``(max - a) << 32 | b`` for ``ORDER BY a DESC, b``)."""

    def one(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_column: pa.array([], pa.int64()),
                    "__one": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                key_column: batch[key_column].combine_chunks().cast(pa.int64()),
                "__one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    stamped = global_prefix_sum(
        ds.map_batches(one, batch_format="pyarrow", batch_size=None),
        key_column,
        "__one",
        alias=alias,
        num_partitions=num_partitions,
        samples_per_block=samples_per_block,
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_column: pa.array([], pa.int64()),
                    alias: pa.array([], pa.int64()),
                }
            )
        r = batch[alias].to_numpy(zero_copy_only=False) + 1
        return pa.table(
            {
                key_column: batch[key_column].combine_chunks(),
                alias: pa.array(r.astype(np.int64)),
            }
        )

    return stamped.map_batches(finish, batch_format="pyarrow", batch_size=None)
