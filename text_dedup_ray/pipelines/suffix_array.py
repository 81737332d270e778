"""Exact-substring dedup (suffix-array) pipeline.

Reference lifecycle (suffix_array.py:22-109): serialize the WHOLE corpus to
one bytes file single-threaded -> external Rust suffix array -> global
duplicate byte ranges -> restore to per-doc slices -> cut -> drop empties.

Ray version: each partition of documents is one independent corpus — inside
``map_batches`` (whole-block batches) the partition's docs are concatenated
with recorded boundaries (like suffix_array.py:48-56), a numpy suffix array
finds duplicated ranges >= length_threshold, and the reference's
restore/merge/cut semantics (functions/intervals.py) map them back to
per-doc slices.

PARTITIONING ASSUMPTION (SURVEY §7.4): duplicates are detected *within* a
partition; a verbatim run shared only across partitions is missed. At scale
this is the standard locality trade (the reference needs the entire corpus
in one suffix array — impossible at 100 TB). Mitigations: (a) sort/bucket
inputs so near-neighbors co-locate, (b) a cross-partition pass shuffling
length-L boundary grams (future work — documented, not silent).

Docs whose text becomes empty after cutting are dropped
(suffix_array.py:93-97).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.intervals import clean_up, restore_and_merge
from ..functions.suffixarray import duplicate_byte_ranges


def suffix_array_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    length_threshold: int = 100,
    merge_strategy: str = "longest",
    partition_size_rows: int | None = None,
    drop_empty: bool = True,
) -> ray.data.Dataset:
    """Cut duplicated byte runs >= length_threshold out of every document."""
    if partition_size_rows:
        # bound per-partition corpus size so the O(n log^2 n) build stays cheap
        count = ds.count()
        ds = ds.repartition(max(1, count // partition_size_rows))

    def dedup_partition(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        if not texts:
            return batch
        encoded = [t.encode("utf-8") for t in texts]
        boundaries = []
        off = 0
        for e in encoded:
            boundaries.append((off, off + len(e)))
            off += len(e)
        data = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        ranges = duplicate_byte_ranges(data, length_threshold)
        per_doc, _dup_size = restore_and_merge(
            boundaries, ranges, length_threshold, merge_strategy
        )
        new_texts = [
            clean_up(t, slices) if slices else t for t, slices in zip(texts, per_doc)
        ]
        idx = batch.column_names.index(text_column)
        out = batch.set_column(idx, text_column, pa.array(new_texts, pa.string()))
        if drop_empty:
            mask = pa.array([bool(t) for t in new_texts])
            out = out.filter(mask)
        return out

    return ds.map_batches(dedup_partition, batch_format="pyarrow", batch_size=None)


def suffix_array_dedup_global(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str | None = None,
    length_threshold: int = 100,
    merge_strategy: str = "longest",
    drop_empty: bool = True,
    num_partitions: int = 32,
    anchor_k: int = 16,
    max_bucket: int = 512,
    max_group: int = 4096,
) -> ray.data.Dataset:
    """Exact-substring dedup with GLOBAL (cross-partition) semantics.

    The partition-local pass misses verbatim runs shared only across
    partitions (SURVEY §7.4). This variant first co-locates candidate
    documents with content-defined anchors:

    1. every doc emits its winnowing minimizer hashes (functions/suffixarray
       .minimizer_hashes) — any two docs sharing a run >= length_threshold
       share an anchor regardless of byte alignment;
    2. an anchor-hash exchange emits star edges between co-anchored docs;
       connected components give co-processing groups;
    3. docs are exchanged by group id; each group is deduped as one corpus
       with the exact kernel. Grouped-apart docs provably share no run
       >= length_threshold, so processing them separately equals the
       reference's corpus-wide suffix array (up to the logged ``max_bucket``
       / ``max_group`` skew caps — hot boilerplate anchors).

    Within-doc repeats are always cut (every doc passes through the kernel).
    """
    import logging

    from ..functions.suffixarray import minimizer_hashes
    from ..sources.io import ROW_ID, stamp_row_ids_from_key
    from ..stages.cc import connected_components
    from ..stages.exchange import hash_partition_exchange

    logger = logging.getLogger(__name__)
    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    elif ROW_ID not in ds.schema().names:
        raise ValueError("dataset must have a row_id column or pass id_column")

    def emit_anchors(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        ids = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        out_h: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        for i, t in enumerate(texts):
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            h = minimizer_hashes(data, k=anchor_k, length_threshold=length_threshold)
            if len(h):
                out_h.append(h)
                out_id.append(np.full(len(h), ids[i], dtype=np.int64))
        if not out_h:
            return pa.table(
                {"h": pa.array([], pa.uint64()), "row_id": pa.array([], pa.int64()),
                 "part": pa.array([], pa.int64())}
            )
        h = np.concatenate(out_h)
        rid = np.concatenate(out_id)
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"h": h, "row_id": rid, "part": part})

    def anchor_edges(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        h = group["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rid = group["row_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((rid, h))
        hs, rs = h[order], rid[order]
        starts = np.flatnonzero(np.r_[True, np.diff(hs.view(np.int64)) != 0])
        ends = np.r_[starts[1:], len(hs)]
        src_out, dst_out = [], []
        dropped = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > max_bucket:
                dropped += 1
                continue
            members = np.unique(rs[s:e])
            if len(members) < 2:
                continue
            src_out.append(members[1:])
            dst_out.append(np.full(len(members) - 1, members[0], dtype=np.int64))
        if dropped:
            logger.warning("suffix_global: %d anchor buckets above cap %d dropped",
                           dropped, max_bucket)
        if not src_out:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return pa.table(
            {"src": np.concatenate(src_out), "dst": np.concatenate(dst_out)}
        )

    anchors = ds.map_batches(emit_anchors, batch_format="pyarrow")
    edges = hash_partition_exchange(anchors, "part", num_partitions, anchor_edges)
    groups = connected_components(edges)

    import ray as _ray

    if groups:
        members = np.fromiter(groups.keys(), dtype=np.int64, count=len(groups))
        roots = np.fromiter(groups.values(), dtype=np.int64, count=len(groups))
        order = np.argsort(members, kind="stable")
        members, roots = members[order], roots[order]
    else:
        members = np.empty(0, dtype=np.int64)
        roots = np.empty(0, dtype=np.int64)
    group_ref = _ray.put((members, roots))

    def tag_group(batch: pa.Table) -> pa.Table:
        mem, rts = _ray.get(group_ref)
        ids = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(mem):
            pos = np.clip(np.searchsorted(mem, ids), 0, len(mem) - 1)
            hit = mem[pos] == ids
            grp = np.where(hit, rts[pos], ids)
        else:
            grp = ids
        part = (np.abs(grp) % num_partitions).astype(np.int64)
        return batch.append_column("__group__", pa.array(grp)).append_column(
            "part", pa.array(part)
        )

    def dedup_groups(part_tbl: pa.Table) -> pa.Table:
        if part_tbl.num_rows == 0:
            return part_tbl
        grp = part_tbl["__group__"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(grp, kind="stable")
        tbl = part_tbl.take(pa.array(order))
        grp_s = grp[order]
        starts = np.flatnonzero(np.r_[True, np.diff(grp_s) != 0])
        ends = np.r_[starts[1:], len(grp_s)]
        pieces = []
        truncated = 0
        # singletons (no >=L run shared with ANY other doc) can be processed
        # together as one corpus — no cross-doc ranges can appear
        singleton_slices = []
        for s, e in zip(starts, ends):
            if e - s == 1:
                singleton_slices.append(tbl.slice(s, 1))
            else:
                m = e - s
                if m > max_group:
                    truncated += m - max_group
                    m = max_group
                pieces.append(_dedup_table_chunk(
                    tbl.slice(s, m), text_column, length_threshold, merge_strategy, drop_empty
                ))
                if e - s > max_group:
                    pieces.append(_dedup_table_chunk(
                        tbl.slice(s + max_group, e - s - max_group),
                        text_column, length_threshold, merge_strategy, drop_empty,
                    ))
        if singleton_slices:
            singles = pa.concat_tables(singleton_slices)
            pieces.append(_dedup_table_chunk(
                singles, text_column, length_threshold, merge_strategy, drop_empty
            ))
        if truncated:
            logger.warning("suffix_global: group larger than %d split (%d rows overflowed)",
                           max_group, truncated)
        if not pieces:
            return tbl.drop_columns(["__group__", "part"]).slice(0, 0)
        return pa.concat_tables([p.drop_columns(["__group__", "part"]) for p in pieces])

    tagged = ds.map_batches(tag_group, batch_format="pyarrow")
    return hash_partition_exchange(tagged, "part", num_partitions, dedup_groups)


def _dedup_table_chunk(
    tbl: pa.Table, text_column: str, length_threshold: int, merge_strategy: str,
    drop_empty: bool,
) -> pa.Table:
    """Run the exact kernel over one co-processing group (arrow table)."""
    texts = tbl[text_column].to_pylist()
    encoded = [t.encode("utf-8") for t in texts]
    boundaries = []
    off = 0
    for e in encoded:
        boundaries.append((off, off + len(e)))
        off += len(e)
    data = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    ranges = duplicate_byte_ranges(data, length_threshold)
    per_doc, _size = restore_and_merge(boundaries, ranges, length_threshold, merge_strategy)
    new_texts = [clean_up(t, sl) if sl else t for t, sl in zip(texts, per_doc)]
    idx = tbl.column_names.index(text_column)
    out = tbl.set_column(idx, text_column, pa.array(new_texts, pa.string()))
    if drop_empty:
        out = out.filter(pa.array([bool(t) for t in new_texts]))
    return out
