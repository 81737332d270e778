"""LSH bucket -> candidate-edge extraction (the wide step).

Reference behavior: collect ALL signature rows into driver-local polars,
``group_by(band).agg(list)``, explode to O(bucket^2) pairs, Rust CC
(minhash.py:48-79); SimHash runs a sequential driver loop over buckets
(simhash.py:43-71). Neither survives 100 TB, so this stage is a two-level
exchange:

1. **Local pre-aggregation** (``map_batches`` over whole blocks): group the
   block's signature rows by exact bucket key with one vectorized
   ``np.unique`` and emit
   - star edges ``member -> block-local bucket min`` (O(bucket), not
     O(bucket^2), and connected-component-equivalent to the reference's pair
     join since MinHash unions every bucket pair unconditionally), and
   - ONE representative row per distinct bucket (MinHash) / per distinct
     (bucket, signature) (SimHash) per block.
   Only representatives cross the wire: shuffle volume drops from
   O(rows x bands) to O(distinct buckets per block).

2. **Partitioned rep-merge**: representatives get ``part = hash(key) % P``
   and one ``groupby("part").map_groups`` call per partition (P vectorized
   kernel calls total) emits the cross-block edges.

SimHash differs because bucket members are only unioned when
``hamming(sig_a, sig_b) <= bit_diff`` (simhash.py:62-67). Hamming distance is
a function of the signature *values*, so we collapse identical signatures
first (star edges) and compare only distinct values pairwise — exact, and it
turns the degenerate giant bucket (e.g. every empty caption -> sig 0) from
O(members^2) into O(distinct^2).

Skew posture: hash partitioning spreads buckets across P parts; a degenerate
bucket contributes one rep per *block*, so hot-key inflow is bounded by block
count, not row count (SURVEY §4).

Edges are ``(src:int64, dst:int64)`` with ``dst < src``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data


# ---------------------------------------------------------------- helpers


def _void_view(mat: np.ndarray) -> np.ndarray:
    """(n, w) uint8 -> length-n opaque fixed-width key array (exact equality)."""
    mat = np.ascontiguousarray(mat)
    return mat.view([("v", f"V{mat.shape[1]}")])["v"].reshape(-1)


def _group_min(keys_void: np.ndarray, row_ids: np.ndarray):
    """Vectorized group-by-key with per-group min row_id.

    Returns (order, starts, group_mins, inv_sorted): ``order`` sorts rows by
    group, ``starts`` indexes group beginnings in the sorted view, ``mins`` is
    the per-group min row_id, ``inv_sorted`` maps each sorted row to its
    group index.
    """
    _, inverse = np.unique(keys_void, return_inverse=True)
    order = np.argsort(inverse, kind="stable")
    inv_sorted = inverse[order]
    starts = np.flatnonzero(np.r_[True, np.diff(inv_sorted) != 0])
    mins = np.minimum.reduceat(row_ids[order], starts)
    return order, starts, mins, inv_sorted


def _binary_to_u8(col: pa.ChunkedArray, width: int, n: int) -> np.ndarray:
    """Zero-copy-ish view of a (fixed-size) binary column as (n, width) uint8."""
    arr = col.combine_chunks()
    if pa.types.is_fixed_size_binary(arr.type):
        buf = arr.buffers()[1]
        return np.frombuffer(buf, dtype=np.uint8, count=(arr.offset + n) * width).reshape(
            -1, width
        )[arr.offset :]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=n + 1 + arr.offset)[arr.offset :]
    idx = offs[:-1, None] + np.arange(width)
    return data[idx]


def _fixed_binary(keys: np.ndarray) -> pa.Array:
    """length-n void array -> FixedSizeBinaryArray."""
    width = keys.dtype.itemsize
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), len(keys), [None, pa.py_buffer(np.ascontiguousarray(keys).tobytes())]
    )


def _hash_part(keys_u8: np.ndarray, num_partitions: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = np.zeros(len(keys_u8), dtype=np.uint64)
        for j in range(keys_u8.shape[1]):
            h = h * np.uint64(1000003) + keys_u8[:, j].astype(np.uint64)
    return (h % np.uint64(num_partitions)).astype(np.int32)


EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _edge_table(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    return pa.table({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})


# ---------------------------------------------------------------- MinHash


def minhash_bucket_key_u8(batch: pa.Table) -> np.ndarray:
    """(band_idx, band_val) -> (n, 4 + w) exact key matrix."""
    n = batch.num_rows
    band_idx = batch["band_idx"].to_numpy(zero_copy_only=False).astype(np.int32)
    width = batch.schema.field("band_val").type.byte_width
    vals = _binary_to_u8(batch["band_val"], width, n)
    out = np.empty((n, 4 + width), dtype=np.uint8)
    out[:, :4] = band_idx.view(np.uint8).reshape(n, 4)
    out[:, 4:] = vals
    return out


def minhash_local_buckets(batch: pa.Table) -> pa.Table:
    """Stage-1 kernel: star edges within local buckets + one rep per bucket.

    Output: edge rows (is_edge=True, src, dst) and rep rows
    (is_edge=False, src=block-local bucket min, key=bucket key bytes).
    """
    row_ids = batch["row_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keys = _void_view(minhash_bucket_key_u8(batch))
    order, starts, mins, inv_sorted = _group_min(keys, row_ids)
    rid_sorted = row_ids[order]
    dst = mins[inv_sorted]
    mask = rid_sorted != dst
    edge_src, edge_dst = rid_sorted[mask], dst[mask]
    rep_keys = keys[order][starts]
    n_edges, n_reps = len(edge_src), len(starts)
    width = keys.dtype.itemsize
    return pa.table(
        {
            "is_edge": np.r_[np.ones(n_edges, dtype=bool), np.zeros(n_reps, dtype=bool)],
            "src": np.concatenate([edge_src, mins]),
            "dst": np.concatenate([edge_dst, np.full(n_reps, -1, dtype=np.int64)]),
            "key": _fixed_binary(
                np.concatenate([np.zeros(n_edges, dtype=f"V{width}"), rep_keys])
            ),
        }
    )


def minhash_rep_part(reps: pa.Table, num_partitions: int) -> np.ndarray:
    """Hash partition of rep rows by their full bucket key bytes."""
    width = reps.schema.field("key").type.byte_width
    keys = _binary_to_u8(reps["key"], width, reps.num_rows)
    return _hash_part(keys, num_partitions)


def minhash_rep_reduce(group: pa.Table) -> pa.Table:
    """Stage-2 kernel: star edges among each bucket's per-scope reps."""
    n = group.num_rows
    if n == 0:
        return _edge_table(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    width = group.schema.field("key").type.byte_width
    keys = _void_view(_binary_to_u8(group["key"], width, n))
    row_ids = group["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    order, _starts, mins, inv_sorted = _group_min(keys, row_ids)
    rid_sorted = row_ids[order]
    dst = mins[inv_sorted]
    mask = rid_sorted != dst
    return _edge_table(rid_sorted[mask], dst[mask])


def minhash_merge_reps(reps: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """Stage-2: star edges among each bucket's per-block representatives."""

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pa.array(minhash_rep_part(batch, num_partitions))
        )

    from .exchange import hash_partition_exchange

    reps = reps.map_batches(add_part, batch_format="pyarrow")
    return hash_partition_exchange(reps, "part", num_partitions, minhash_rep_reduce)


# ---------------------------------------------------------------- SimHash


def simhash_local_buckets(batch: pa.Table, sig_bytes: int = 8) -> pa.Table:
    """Stage-1 kernel for SimHash signature rows (row_id, perm_idx, key, sig).

    Groups by (perm_idx, key, sig): identical signatures in the same bucket
    always union (hamming 0) -> star edges; one rep per distinct
    (bucket, sig) carries the sig for the cross-value Hamming check later.

    ``sig_bytes`` is ``f // 8``: the packed key layout is perm_idx (4B) +
    bucket key (8B) + signature (sig_bytes). At f = 64 the ``sig`` column is
    uint64; wider fingerprints (f = 128) carry ``sig`` as
    fixed_size_binary(f//8) big-endian — same kernels, wider rows.
    """
    n = batch.num_rows
    width = 12 + sig_bytes
    row_ids = batch["row_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    perm_idx = batch["perm_idx"].to_numpy(zero_copy_only=False).astype(np.int32)
    key = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    mat = np.empty((n, width), dtype=np.uint8)
    mat[:, :4] = perm_idx.view(np.uint8).reshape(n, 4)
    mat[:, 4:12] = key.view(np.uint8).reshape(n, 8)
    if sig_bytes == 8:
        sig = batch["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mat[:, 12:] = sig.view(np.uint8).reshape(n, 8)
    else:
        mat[:, 12:] = _binary_to_u8(batch["sig"], sig_bytes, n)
    keys = _void_view(mat)
    order, starts, mins, inv_sorted = _group_min(keys, row_ids)
    rid_sorted = row_ids[order]
    dst = mins[inv_sorted]
    mask = rid_sorted != dst
    edge_src, edge_dst = rid_sorted[mask], dst[mask]
    n_edges, n_reps = len(edge_src), len(starts)
    bucket_keys = keys[order][starts]  # bucket (12B) + sig (sig_bytes)
    return pa.table(
        {
            "is_edge": np.r_[np.ones(n_edges, dtype=bool), np.zeros(n_reps, dtype=bool)],
            "src": np.concatenate([edge_src, mins]),
            "dst": np.concatenate([edge_dst, np.full(n_reps, -1, dtype=np.int64)]),
            "key": _fixed_binary(
                np.concatenate([np.zeros(n_edges, dtype=f"V{width}"), bucket_keys])
            ),
        }
    )


def simhash_rep_part(
    reps: pa.Table, num_partitions: int, sig_bytes: int = 8
) -> np.ndarray:
    """Partition by the bucket prefix (first 12 bytes of the key) only."""
    keys = _binary_to_u8(reps["key"], 12 + sig_bytes, reps.num_rows)
    return _hash_part(keys[:, :12], num_partitions)


def simhash_rep_reduce(
    group: pa.Table, bit_diff: int, max_distinct_sigs: int = 8192,
    sig_bytes: int = 8,
) -> pa.Table:
    """Stage-2 kernel for SimHash reps: merge same-sig reps across scopes,
    then pairwise-Hamming the distinct signature values per bucket."""
    return _simhash_per_partition(group, bit_diff, max_distinct_sigs, sig_bytes)


def simhash_merge_reps(
    reps: ray.data.Dataset,
    bit_diff: int,
    num_partitions: int = 64,
    max_distinct_sigs: int = 8192,
    sig_bytes: int = 8,
) -> ray.data.Dataset:
    """Stage-2 for SimHash: per bucket, merge same-sig reps across blocks,
    then pairwise-Hamming the distinct signature values (vectorized
    XOR+popcount) and emit edges for pairs within ``bit_diff``.

    ``max_distinct_sigs`` caps the quadratic compare per bucket; overflow is
    truncated WITH a logged count (no silent caps). The reference has the
    same quadratic core, un-capped and single-threaded (simhash.py:62-67).
    """

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pa.array(simhash_rep_part(batch, num_partitions, sig_bytes))
        )

    def per_partition(group: pa.Table) -> pa.Table:
        return _simhash_per_partition(group, bit_diff, max_distinct_sigs, sig_bytes)

    from .exchange import hash_partition_exchange

    reps = reps.map_batches(add_part, batch_format="pyarrow")
    return hash_partition_exchange(reps, "part", num_partitions, per_partition)


def simhash_distinct_sig_edges(
    rep_mat: np.ndarray,
    rep_min: np.ndarray,
    bit_diff: int,
    max_distinct_sigs: int,
    new_mask: np.ndarray | None = None,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Cross-signature Hamming edges among DISTINCT (bucket, sig) reps:
    group the (n, 12 + f//8) key matrix by its 12-byte bucket prefix and
    pairwise-compare the distinct sigs per bucket (vectorized byte-matrix
    XOR + popcount — any signature width; at f=64 bit-identical to the old
    uint64 kernel). Shared by the batch exchange and the incremental index
    reduce; the signature width is inferred from the matrix width.

    ``new_mask`` (incremental path, ADVICE r2): marks reps that entered the
    index THIS increment. When given, only (new x new) and (new x old) pairs
    are compared — old-old connectivity is already folded into the prior
    cluster map, so re-emitting it costs O(index density) per increment for
    nothing. Truncation under the cap then keeps ALL new sigs first (the old
    ones it evicts were already compared in prior runs)."""
    out_src: list[np.ndarray] = []
    out_dst: list[np.ndarray] = []
    bucket_keys = _void_view(rep_mat[:, :12])
    b_order = np.argsort(bucket_keys, kind="stable")
    bk_sorted = bucket_keys[b_order]
    b_starts = np.flatnonzero(np.r_[True, bk_sorted[1:] != bk_sorted[:-1]])
    b_ends = np.r_[b_starts[1:], len(bk_sorted)]
    sig_mat = np.ascontiguousarray(rep_mat[:, 12:])  # (n, f//8) raw sig bytes
    truncated = 0
    for s, e in zip(b_starts, b_ends):
        m = e - s
        if m < 2:
            continue
        idx = b_order[s:e]
        if new_mask is not None:
            nm = new_mask[idx]
            sel_new = idx[nm]
            if len(sel_new) == 0:
                continue  # pure-old bucket: edges already in the prior map
            sel_old = idx[~nm]
            if len(idx) > max_distinct_sigs:
                truncated += len(idx) - max_distinct_sigs
                if len(sel_new) > max_distinct_sigs:
                    sel_new = sel_new[
                        np.argsort(rep_min[sel_new], kind="stable")[:max_distinct_sigs]
                    ]
                    sel_old = sel_old[:0]
                else:
                    keep = max_distinct_sigs - len(sel_new)
                    sel_old = sel_old[np.argsort(rep_min[sel_old], kind="stable")[:keep]]
            idx = np.concatenate([sel_old, sel_new])  # old first, new last
            m = len(idx)
            n_old = len(sel_old)
            bucket_sigs = sig_mat[idx]
            bucket_ids = rep_min[idx]
            new_sigs = bucket_sigs[n_old:]
            xor = new_sigs[:, None, :] ^ bucket_sigs[None, :, :]
            ham = _POPCOUNT_TABLE[xor].sum(axis=2, dtype=np.uint16)
            # row i is bucket position n_old+i; allow old cols always, new
            # cols only above the diagonal (dedupe new-new, skip self)
            cols = np.arange(m)[None, :]
            rows = (n_old + np.arange(m - n_old))[:, None]
            allow = (cols < n_old) | (cols > rows)
            ii, jj = np.nonzero((ham <= bit_diff) & allow)
            if len(ii):
                a = bucket_ids[n_old + ii]
                b = bucket_ids[jj]
                out_src.append(np.maximum(a, b))
                out_dst.append(np.minimum(a, b))
            continue
        if m > max_distinct_sigs:
            truncated += m - max_distinct_sigs
            idx = idx[np.argsort(rep_min[idx], kind="stable")[:max_distinct_sigs]]
            m = max_distinct_sigs
        bucket_sigs = sig_mat[idx]
        bucket_ids = rep_min[idx]
        xor = bucket_sigs[:, None, :] ^ bucket_sigs[None, :, :]
        ham = _POPCOUNT_TABLE[xor].sum(axis=2, dtype=np.uint16)
        ii, jj = np.nonzero(np.triu(ham <= bit_diff, k=1))
        if len(ii):
            a = bucket_ids[ii]
            b = bucket_ids[jj]
            out_src.append(np.maximum(a, b))
            out_dst.append(np.minimum(a, b))
    if truncated:
        import logging

        logging.getLogger(__name__).warning(
            "simhash bucket compare truncated %d distinct sigs (cap %d)",
            truncated,
            max_distinct_sigs,
        )
    return out_src, out_dst


def _simhash_per_partition(
    group: pa.Table, bit_diff: int, max_distinct_sigs: int, sig_bytes: int = 8
) -> pa.Table:
    n = group.num_rows
    if n == 0:
        return _edge_table(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    mat = _binary_to_u8(group["key"], 12 + sig_bytes, n)
    row_ids = group["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    # 1) merge identical (bucket, sig) reps across blocks: star edges
    full_keys = _void_view(mat)
    order, starts, mins, inv_sorted = _group_min(full_keys, row_ids)
    rid_sorted = row_ids[order]
    dst = mins[inv_sorted]
    mask = rid_sorted != dst
    out_src = [rid_sorted[mask]]
    out_dst = [dst[mask]]
    # 2) distinct (bucket, sig) reps: group by bucket, compare sigs
    cross_src, cross_dst = simhash_distinct_sig_edges(
        mat[order][starts], mins, bit_diff, max_distinct_sigs
    )
    out_src.extend(cross_src)
    out_dst.extend(cross_dst)
    return _edge_table(np.concatenate(out_src), np.concatenate(out_dst))


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def split_edges_and_reps(
    local: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Split the tagged stage-1 output into (edges, reps) datasets."""
    import pyarrow.compute as pc

    edges = local.map_batches(
        lambda t: t.filter(pc.field("is_edge")).select(["src", "dst"]),
        batch_format="pyarrow",
    )
    reps = local.map_batches(
        lambda t: t.filter(pc.invert(pc.field("is_edge"))).select(["src", "key"]),
        batch_format="pyarrow",
    )
    return edges, reps
