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
    driver_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Exact-substring dedup with GLOBAL (cross-partition) semantics.

    The partition-local pass misses verbatim runs shared only across
    partitions (SURVEY §7.4). This variant first co-locates candidate
    documents with content-defined anchors:

    1. every doc emits its winnowing minimizer hashes (functions/suffixarray
       .minimizer_hashes) — any two docs sharing a run >= length_threshold
       share an anchor regardless of byte alignment;
    2. an anchor-hash exchange emits star edges between co-anchored docs;
       connected components (``connected_components_auto`` — a driver dict
       below ``driver_threshold`` reduced edges, a Dataset + sharded lookup
       above it, so the group map never forces driver state at scale) give
       co-processing groups;
    3. docs are exchanged by group id; each group is deduped as one corpus
       with the exact kernel. Grouped-apart docs provably share no run
       >= length_threshold, so processing them separately equals the
       reference's corpus-wide suffix array (up to the logged ``max_group``
       chunking of giant groups — see below).

    Anchor buckets larger than ``max_bucket`` (hot boilerplate shared by
    very many docs) are NOT dropped: they emit the same linear star edges
    (hub = min member). The resulting giant group is processed in
    ``max_group``-row chunks with the group's ROOT doc replicated into every
    chunk — each chunk then holds >= 2 copies of any run shared between the
    root and a member, so hot boilerplate is still cut from every doc at
    O(chunk) memory instead of one quadratic corpus. Runs shared only
    between two non-root members of different chunks of the same giant
    group can still be missed (logged).

    Within-doc repeats are always cut (every doc passes through the kernel).
    """
    import logging

    from ..functions.suffixarray import minimizer_hashes
    from ..sources.io import ROW_ID, stamp_row_ids_from_key
    from ..stages.cc import connected_components_auto
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
        hub_routed = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > max_bucket:
                hub_routed += 1  # star edges are linear either way; the cap
                # now only marks the bucket for the chunked hub-replication
                # path downstream instead of silently dropping it
            members = np.unique(rs[s:e])
            if len(members) < 2:
                continue
            src_out.append(members[1:])
            dst_out.append(np.full(len(members) - 1, members[0], dtype=np.int64))
        if hub_routed:
            logger.info("suffix_global: %d anchor buckets above cap %d routed "
                        "through hub-replicated chunking", hub_routed, max_bucket)
        if not src_out:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return pa.table(
            {"src": np.concatenate(src_out), "dst": np.concatenate(dst_out)}
        )

    anchors = ds.map_batches(emit_anchors, batch_format="pyarrow")
    edges = hash_partition_exchange(anchors, "part", num_partitions, anchor_edges)
    groups = connected_components_auto(
        edges, driver_threshold=driver_threshold, num_partitions=num_partitions
    )

    import ray as _ray

    if isinstance(groups, dict):
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

        tagged = ds.map_batches(tag_group, batch_format="pyarrow")
    else:
        # group map too large to broadcast: sharded object-store lookup
        # (same machinery as cluster assignment — payload rows never move
        # for the tag itself, only for the group exchange below)
        from ..stages.assign import CLUSTER_COLUMN, DUPLICATE_COLUMN, assign_clusters_sharded

        with_groups = assign_clusters_sharded(
            ds, groups.materialize(), num_shards=num_partitions
        )

        def derive_part(batch: pa.Table) -> pa.Table:
            grp = batch[CLUSTER_COLUMN].to_numpy(zero_copy_only=False).astype(np.int64)
            part = (np.abs(grp) % num_partitions).astype(np.int64)
            out = batch.drop_columns([DUPLICATE_COLUMN])
            names = out.column_names
            out = out.rename_columns(
                ["__group__" if c == CLUSTER_COLUMN else c for c in names]
            )
            return out.append_column("part", pa.array(part))

        tagged = with_groups.map_batches(derive_part, batch_format="pyarrow")

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
        chunked_groups = 0
        # singletons (no >=L run shared with ANY other doc) can be processed
        # together as one corpus — no cross-doc ranges can appear
        singleton_slices = []
        for s, e in zip(starts, ends):
            if e - s == 1:
                singleton_slices.append(tbl.slice(s, 1))
                continue
            m = e - s
            if m <= max_group:
                pieces.append(_dedup_table_chunk(
                    tbl.slice(s, m), text_column, length_threshold, merge_strategy, drop_empty
                ))
                continue
            # giant group (hot boilerplate): process in max_group-row chunks
            # with the group ROOT doc replicated into every chunk, so each
            # chunk holds >= 2 copies of any root-shared run — boilerplate
            # is cut everywhere at O(chunk) memory. Root output comes from
            # chunk 0 only.
            chunked_groups += 1
            group_tbl = tbl.slice(s, m)
            ids_g = group_tbl[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
            hub_id = int(grp_s[s])
            hub_mask = ids_g == hub_id
            if hub_mask.any():
                hub_tbl = group_tbl.filter(pa.array(hub_mask))
                rest = group_tbl.filter(pa.array(~hub_mask))
            else:  # root doc absent (shouldn't happen) — first row stands in
                hub_tbl = group_tbl.slice(0, 1)
                rest = group_tbl.slice(1)
                hub_id = int(ids_g[0])
            chunk_rows = max(1, max_group - 1)
            for ci, cs in enumerate(range(0, rest.num_rows, chunk_rows)):
                aug = pa.concat_tables([hub_tbl, rest.slice(cs, chunk_rows)])
                out = _dedup_table_chunk(
                    aug, text_column, length_threshold, merge_strategy, drop_empty
                )
                if ci > 0 and out.num_rows:
                    out_ids = out[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
                    out = out.filter(pa.array(out_ids != hub_id))
                pieces.append(out)
        if singleton_slices:
            singles = pa.concat_tables(singleton_slices)
            pieces.append(_dedup_table_chunk(
                singles, text_column, length_threshold, merge_strategy, drop_empty
            ))
        if chunked_groups:
            logger.info(
                "suffix_global: %d groups larger than %d processed via "
                "hub-replicated chunks (runs shared only between non-root "
                "members of different chunks can be missed)",
                chunked_groups, max_group,
            )
        if not pieces:
            return tbl.drop_columns(["__group__", "part"]).slice(0, 0)
        return pa.concat_tables([p.drop_columns(["__group__", "part"]) for p in pieces])

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
