"""Exact (content-hash) dedup — the Bloom-filter replacement.

The reference's bloom_filter.py:23-60 streams every doc through one
``rbloom.Bloom`` sequentially (``num_proc=1``; first occurrence wins, with a
configurable false-positive rate that can silently drop unique docs).

Ray-native exact dedup needs no approximate state: hash the content in a
vectorized ``map_batches``, then keep the minimum row_id per hash — the same
"first occurrence in row order wins" semantics, exact, and fully parallel.

Two survivor-selection paths, chosen by the winner-set size:

- broadcast (winner set fits ``broadcast_limit``): two-level aggregation
  (partial min inside each block, small exchange over the partials), winner
  ids broadcast once via ``ray.put`` as a sorted array, vectorized
  ``np.searchsorted`` membership filter per payload batch. Payloads never
  move.
- shuffle (winner set ~ corpus size — the 100 TB posture): the payload rows
  themselves are hash-partitioned by content hash through the explicit
  exchange and each partition keeps its min-row_id row per hash. One payload
  shuffle, zero driver-resident state, no broadcast. This is the
  "hash-partition + per-group first" shape.

``exact_cluster_table`` never touches the driver at any size: one narrow
(hash, row_id) exchange computes min-per-hash inside each partition and emits
(row_id, cluster_id) directly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.io import ROW_ID, stamp_row_ids_from_key
from ..stages.exchange import hash_partition_exchange


HASH_WIDTH = 16  # 128-bit content digests: collision-free in expectation even
# at 10^12 rows (a 64-bit prefix would already expect ~30 birthday collisions
# there, silently merging distinct texts)


def _digest_bytes(texts: list) -> bytes:
    """Concatenated 16-byte sha1-prefix digests of each value — str encodes
    utf-8, bytes (binary payload columns: image bytes, audio) hash as-is, so
    exact dedup works over multimodal content columns too."""
    sha1 = hashlib.sha1
    return b"".join(
        sha1(t if isinstance(t, bytes) else (t or "").encode("utf-8")).digest()[
            :HASH_WIDTH
        ]
        for t in texts
    )


def add_content_hash(
    ds: ray.data.Dataset, text_column: str, hash_column: str = "__content_hash__"
) -> ray.data.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(HASH_WIDTH), len(texts), [None, pa.py_buffer(_digest_bytes(texts))]
        )
        return batch.append_column(hash_column, col)

    return ds.map_batches(add, batch_format="pyarrow")


def _hash_view(col: "pa.ChunkedArray | pa.Array", n: int) -> np.ndarray:
    """Fixed-size-binary column -> (n,) void16 array (sortable/comparable)."""
    if hasattr(col, "combine_chunks"):
        col = col.combine_chunks()
    buf = col.buffers()[1]
    off = col.offset * HASH_WIDTH
    return np.frombuffer(buf, dtype=f"V{HASH_WIDTH}", count=n, offset=off)


def _void_to_fixed(arr: np.ndarray) -> pa.Array:
    """(n,) void16 -> fixed_size_binary(16) Arrow array."""
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(HASH_WIDTH), len(arr), [None, pa.py_buffer(arr.tobytes())]
    )


def _partial_min_kernel(hash_col: str):
    """Per-block combiner: one (hash, min row_id) row per distinct hash."""

    def partial_min(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = _hash_view(batch[hash_col], n)
        r = batch[ROW_ID].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, rs = h[order], r[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        return pa.table(
            {hash_col: _void_to_fixed(hs[starts]), ROW_ID: np.minimum.reduceat(rs, starts)}
        )

    return partial_min


def _add_hash_part(hash_col: str, num_partitions: int):
    def add(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = _hash_view(batch[hash_col], n)
        # partition on the first 8 digest bytes (uniform)
        lead = np.ascontiguousarray(
            h.view(np.uint8).reshape(n, HASH_WIDTH)[:, :8]
        ).view(np.uint64).reshape(-1)
        part = (lead % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    return add


def _winners_dataset(
    hashed: ray.data.Dataset, hash_col: str, num_partitions: int
) -> ray.data.Dataset:
    """(hash, winner) per distinct hash — pre-aggregated partials through the
    sort-free exchange (never Ray's sort-based groupby)."""
    partials = hashed.select_columns([hash_col, ROW_ID]).map_batches(
        _partial_min_kernel(hash_col), batch_format="pyarrow", batch_size=None
    )

    def reduce_min(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    hash_col: pa.array([], pa.binary(HASH_WIDTH)),
                    "winner": pa.array([], pa.int64()),
                }
            )
        n = group.num_rows
        h = _hash_view(group[hash_col], n)
        r = group[ROW_ID].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, rs = h[order], r[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        return pa.table(
            {hash_col: _void_to_fixed(hs[starts]), "winner": np.minimum.reduceat(rs, starts)}
        )

    return hash_partition_exchange(
        partials.map_batches(_add_hash_part(hash_col, num_partitions), batch_format="pyarrow"),
        "part",
        num_partitions,
        reduce_min,
    )


def exact_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str | None = None,
    keep_hash: bool = False,
    num_partitions: int = 32,
    broadcast_limit: int = 50_000_000,
) -> ray.data.Dataset:
    """Keep the min-row_id occurrence of each distinct text value.

    Winner sets up to ``broadcast_limit`` (sorted int64 ids; 50M ≈ 400 MB)
    broadcast once; larger winner sets switch to the payload-shuffle path
    (see module docstring) so the driver never holds O(distinct texts) state.
    """
    hash_col = "__content_hash__"
    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    elif ROW_ID not in ds.schema().names:
        raise ValueError("dataset must have a row_id column or pass id_column")

    hashed = add_content_hash(ds, text_column, hash_col)
    winners = _winners_dataset(hashed, hash_col, num_partitions).materialize()

    if winners.count() > broadcast_limit:
        # scale path: one payload shuffle keyed by content hash; each
        # partition keeps the min-row_id row per hash. No driver state.
        def keep_first(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return group.drop_columns(["part"]) if "part" in group.column_names else group
            h = _hash_view(group[hash_col], group.num_rows)
            r = group[ROW_ID].to_numpy(zero_copy_only=False)
            order = np.argsort(h, kind="stable")
            hs, rs = h[order], r[order]
            diff = np.r_[True, hs[1:] != hs[:-1]]
            starts = np.flatnonzero(diff)
            mins = np.minimum.reduceat(rs, starts)
            group_idx = np.cumsum(diff) - 1
            keep_sorted = rs == mins[group_idx]  # row_ids unique -> one per hash
            keep_rows = np.sort(np.asarray(order)[keep_sorted])
            return group.take(pa.array(keep_rows)).drop_columns(["part"])

        out = hash_partition_exchange(
            hashed.map_batches(_add_hash_part(hash_col, num_partitions), batch_format="pyarrow"),
            "part",
            num_partitions,
            keep_first,
        )
    else:
        winner_ids = np.sort(
            winners.to_pandas()["winner"].to_numpy().astype(np.int64)
        )  # winner set is bounded by broadcast_limit; broadcast once
        winners_ref = ray.put(winner_ids)

        def keep_winners(batch: pa.Table) -> pa.Table:
            w: np.ndarray = ray.get(winners_ref)  # zero-copy from local plasma
            ids = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(w, ids)
            pos = np.clip(pos, 0, max(len(w) - 1, 0))
            mask = (w[pos] == ids) if len(w) else np.zeros(len(ids), bool)
            return batch.filter(pa.array(mask))

        out = hashed.map_batches(keep_winners, batch_format="pyarrow")
    if not keep_hash:
        out = out.drop_columns([hash_col])
    return out


def exact_cluster_table(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """(row_id, cluster_id) where cluster_id = min row_id of identical text —
    the exact-dedup analogue of the cluster map.

    One narrow (hash, row_id) exchange; each partition computes min-per-hash
    and assigns every row in the same vectorized kernel. Nothing is ever
    materialized on the driver (the round-1 driver dict + per-row Python
    lookup is gone)."""
    hash_col = "__content_hash__"
    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    hashed = add_content_hash(ds, text_column, hash_col).select_columns([hash_col, ROW_ID])

    def assign_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {ROW_ID: pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
            )
        h = _hash_view(group[hash_col], group.num_rows)
        r = group[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(h, kind="stable")
        hs, rs = h[order], r[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        mins = np.minimum.reduceat(rs, starts)
        group_idx = np.cumsum(np.r_[False, hs[1:] != hs[:-1]])
        cluster_sorted = mins[group_idx]
        out_cluster = np.empty(len(r), dtype=np.int64)
        out_cluster[order] = cluster_sorted
        return pa.table({ROW_ID: r, "cluster_id": out_cluster})

    return hash_partition_exchange(
        hashed.map_batches(_add_hash_part(hash_col, num_partitions), batch_format="pyarrow"),
        "part",
        num_partitions,
        assign_partition,
    )


def cap_duplicates(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str | None = None,
    k: int = 2,
    copies_alias: str = "n_copies",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Frequency-CAPPED exact dedup: keep the ``k`` smallest-row_id
    occurrences of each distinct text (instead of only the first) and
    stamp every survivor with the text's total occurrence count — the
    "bounded repetition" curation policy (a few copies of popular
    content help training; hundreds don't), with ``copies_alias``
    carrying the duplication factor for loss re-weighting.

    ``k=1`` degenerates to exact_dedup's survivor set plus the count
    column. One payload exchange keyed by the 128-bit content digest
    (the same zero-driver-state scale path as exact_dedup's shuffle
    branch); ranks and counts are one lexsort + reduceat per partition.
    """
    if k < 1:
        raise ValueError("cap_duplicates needs k >= 1")
    hash_col = "__content_hash__"
    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    elif ROW_ID not in ds.schema().names:
        raise ValueError("dataset must have a row_id column or pass id_column")
    hashed = add_content_hash(ds, text_column, hash_col)

    def keep_first_k(group: pa.Table) -> pa.Table:
        drop = [c for c in ("part", hash_col) if c in group.column_names]
        if group.num_rows == 0:
            out = group.drop_columns(drop) if drop else group
            return out.append_column(copies_alias, pa.array([], pa.int64()))
        h = _hash_view(group[hash_col], group.num_rows)
        r = group[ROW_ID].to_numpy(zero_copy_only=False)
        order = np.lexsort((r, h))
        hs = h[order]
        diff = np.r_[True, hs[1:] != hs[:-1]]
        starts = np.flatnonzero(diff)
        grp = np.cumsum(diff) - 1
        counts = np.diff(np.r_[starts, len(hs)]).astype(np.int64)
        rank = np.arange(len(hs)) - starts[grp]
        keep_sorted = rank < k
        take_idx = np.asarray(order)[keep_sorted]
        kept = group.take(pa.array(np.sort(take_idx)))
        # counts in ORIGINAL row order of the kept rows
        n_copies = np.empty(len(hs), np.int64)
        n_copies[order] = counts[grp]
        kept_counts = n_copies[np.sort(take_idx)]
        out = kept.drop_columns(drop) if drop else kept
        return out.append_column(copies_alias, pa.array(kept_counts))

    return hash_partition_exchange(
        hashed.map_batches(
            _add_hash_part(hash_col, num_partitions), batch_format="pyarrow"
        ),
        "part",
        num_partitions,
        keep_first_k,
    )
