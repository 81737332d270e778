"""Exact (content-hash) dedup — the Bloom-filter replacement.

The reference's bloom_filter.py:23-60 streams every doc through one
``rbloom.Bloom`` sequentially (``num_proc=1``; first occurrence wins, with a
configurable false-positive rate that can silently drop unique docs).

Ray-native exact dedup needs no approximate state: hash the content in a
vectorized ``map_batches``, then keep the minimum row_id per hash — the same
"first occurrence in row order wins" semantics, exact, and fully parallel.

The winner-per-hash selection is a two-level aggregation (partial min inside
each block, tiny ``groupby().min()`` over the partials — a pre-aggregated
shuffle, not a row shuffle), then survivors are selected with a broadcast
membership filter. Only (hash, row_id) pairs ever shuffle; payloads stay put.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.io import ROW_ID, stamp_row_ids_from_key


def _hash64(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(
            hashlib.sha1(t.encode("utf-8")).digest()[:8], "little", signed=True
        )
    return out


def add_content_hash(
    ds: ray.data.Dataset, text_column: str, hash_column: str = "__content_hash__"
) -> ray.data.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(hash_column, pa.array(_hash64(batch[text_column].to_pylist())))

    return ds.map_batches(add, batch_format="pyarrow")


def exact_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str | None = None,
    keep_hash: bool = False,
) -> ray.data.Dataset:
    """Keep the min-row_id occurrence of each distinct text value."""
    hash_col = "__content_hash__"
    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    elif ROW_ID not in ds.schema().names:
        raise ValueError("dataset must have a row_id column or pass id_column")

    hashed = add_content_hash(ds, text_column, hash_col)

    # partial min per block (narrow projection), then a small global min
    def partial_min(batch: pa.Table) -> pa.Table:
        h = batch[hash_col].to_numpy(zero_copy_only=False)
        r = batch[ROW_ID].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, rs = h[order], r[order]
        starts = np.flatnonzero(np.r_[True, np.diff(hs) != 0])
        return pa.table({hash_col: hs[starts], ROW_ID: np.minimum.reduceat(rs, starts)})

    partials = hashed.select_columns([hash_col, ROW_ID]).map_batches(
        partial_min, batch_format="pyarrow", batch_size=None
    )
    from ray.data.aggregate import Min

    winners = partials.groupby(hash_col).aggregate(Min(ROW_ID, alias_name="winner"))
    winner_ids = np.sort(
        winners.to_pandas()["winner"].to_numpy().astype(np.int64)
    )  # winner set is ≤ #distinct texts; broadcast once
    winners_ref = ray.put(winner_ids)

    def keep_winners(batch: pa.Table) -> pa.Table:
        winners: np.ndarray = ray.get(winners_ref)  # zero-copy from local plasma
        ids = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(winners, ids)
        pos = np.clip(pos, 0, max(len(winners) - 1, 0))
        mask = (winners[pos] == ids) if len(winners) else np.zeros(len(ids), bool)
        return batch.filter(pa.array(mask))

    out = hashed.map_batches(keep_winners, batch_format="pyarrow")
    if not keep_hash:
        out = out.drop_columns([hash_col])
    return out


def exact_cluster_table(
    ds: ray.data.Dataset, text_column: str = "text", id_column: str | None = None
) -> ray.data.Dataset:
    """(row_id, cluster_id) where cluster_id = min row_id of identical text —
    the exact-dedup analogue of the cluster map."""
    hash_col = "__content_hash__"
    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    hashed = add_content_hash(ds, text_column, hash_col).select_columns([hash_col, ROW_ID])
    from ray.data.aggregate import Min

    winners = hashed.groupby(hash_col).aggregate(Min(ROW_ID, alias_name="cluster_id"))
    joined_map = {}
    for b in winners.iter_batches(batch_size=None, batch_format="pyarrow"):
        for h, w in zip(b[hash_col].to_pylist(), b["cluster_id"].to_pylist()):
            joined_map[h] = w
    ref = ray.put(joined_map)

    def assign(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        hs = batch[hash_col].to_pylist()
        ids = batch[ROW_ID].to_pylist()
        return pa.table(
            {
                ROW_ID: pa.array(ids, pa.int64()),
                "cluster_id": pa.array([m[h] for h in hs], pa.int64()),
            }
        )

    return hashed.map_batches(assign, batch_format="pyarrow")
