"""Corpus-wide exact LINE dedup (C4 / RefinedWeb-style): any line whose
exact text occurs more than once anywhere in the corpus is kept only at its
first occurrence (smallest ``(doc_id, line_no)``); every other occurrence
is cut from its document and the document text is rebuilt.

This is finer-grained than the reference's document-level exact dedup
(reference ``src/text_dedup/bloom_filter.py`` hashes whole documents) — the
line variant is the one large crawl pipelines actually run to strip shared
boilerplate (nav bars, cookie banners) without dropping whole pages.

Scale shape (nothing corpus-sized ever sits on the driver):

1. explode — stateless ``map_batches``: split each doc on ``\\n`` with the
   vectorized Arrow kernel, keep only lines of at least
   ``min_line_length`` chars (short lines never participate — they are
   kept verbatim), and emit ONLY ``(md5-16B line key, doc_id, line_no)``
   — line text never leaves its block;
2. winner election — one hash exchange co-locates every occurrence of a
   line key; a lexsort fold keeps the first ``(doc_id, line_no)`` per key
   and emits the LOSER occurrences only (the set of cuts, which is the
   minimal information the rebuild needs);
3. rebuild — a two-sided exchange co-partitions documents and their cuts
   by doc-id hash; docs with no cuts pass through untouched (fast path),
   cut docs re-split, drop the lost line numbers and re-join with ``\\n``.

Output: the input table with ``text_column`` rebuilt (all other columns
passed through) plus an ``n_dropped`` per-doc counter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.exchange import hash_partition_exchange, two_sided_hash_exchange

_PART = "__ld_part"


def _id_part(vals: np.ndarray, num_partitions: int) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha1(str(v).encode()).digest()[:8], "little")
            % num_partitions
            for v in vals
        ),
        np.int64,
        count=len(vals),
    )


def _explode_lines(
    batch: pa.Table,
    text_column: str,
    id_column: str,
    min_line_length: int,
    num_partitions: int,
    delimiter: str,
) -> pa.Table:
    """(doc_id, line_no, 16B line key, part) for every qualifying line."""
    id_type = batch.schema.field(id_column).type if batch.num_rows else pa.int64()
    empty = pa.table(
        {
            "doc_id": pa.array([], id_type),
            "line_no": pa.array([], pa.int64()),
            "key": pa.array([], pa.binary()),
            _PART: pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    splits = pc.split_pattern(
        batch[text_column].combine_chunks(), delimiter
    )
    flat = pc.list_flatten(splits)
    parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
    offs = splits.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    line_no = np.arange(len(flat), dtype=np.int64) - np.repeat(
        offs[:-1], np.diff(offs)
    )
    qual = (
        pc.utf8_length(flat).to_numpy(zero_copy_only=False) >= min_line_length
    )
    if not qual.any():
        return empty
    lines = flat.to_pylist()
    idx = np.flatnonzero(qual)
    keys = [hashlib.md5(lines[i].encode()).digest() for i in idx]
    part = np.fromiter(
        (int.from_bytes(k[:8], "little") % num_partitions for k in keys),
        np.int64,
        count=len(keys),
    )
    ids = batch[id_column].take(pa.array(parents[idx]))
    return pa.table(
        {
            "doc_id": ids,
            "line_no": pa.array(line_no[idx]),
            "key": pa.array(keys, pa.binary()),
            _PART: pa.array(part),
        }
    )


def _losers(group: pa.Table, num_partitions: int) -> pa.Table:
    """All occurrences of each line key except the first (doc_id, line_no)
    — re-keyed by doc-id hash for the rebuild exchange."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "line_no": pa.array([], pa.int64()),
            _PART: pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0 or "key" not in group.column_names:
        return empty
    keys = np.array(group["key"].to_pylist(), dtype=object)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    lns = group["line_no"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lns, ids, keys))
    sk = keys[order]
    first = np.ones(len(sk), dtype=bool)
    first[1:] = sk[1:] != sk[:-1]
    lose = order[~first]
    if len(lose) == 0:
        return empty.cast(
            pa.schema(
                [
                    ("doc_id", group.schema.field("doc_id").type),
                    ("line_no", pa.int64()),
                    (_PART, pa.int64()),
                ]
            )
        )
    out_ids = group["doc_id"].take(pa.array(lose))
    return pa.table(
        {
            "doc_id": out_ids,
            "line_no": pa.array(lns[lose]),
            _PART: pa.array(_id_part(ids[lose], num_partitions)),
        }
    )


def _rebuild(
    docs: pa.Table | None,
    cuts: pa.Table | None,
    text_column: str,
    id_column: str,
    out_schema: pa.Schema,
    delimiter: str,
) -> pa.Table:
    if docs is None or docs.num_rows == 0:
        return out_schema.empty_table()
    docs = docs.drop_columns([_PART])
    n = docs.num_rows
    dropped = np.zeros(n, dtype=np.int64)
    if cuts is not None and cuts.num_rows > 0:
        ids = docs[id_column].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        cut_ids = cuts["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sorted_ids, cut_ids)
        # every cut's doc lives in this partition by construction
        doc_idx = order[pos]
        cut_lns = cuts["line_no"].to_numpy(zero_copy_only=False)
        texts = docs[text_column].to_pylist()
        by_doc: dict[int, list[int]] = {}
        for d, ln in zip(doc_idx, cut_lns):
            by_doc.setdefault(int(d), []).append(int(ln))
        for d, lns in by_doc.items():
            parts = texts[d].split(delimiter)
            drop = set(lns)
            texts[d] = delimiter.join(
                p for i, p in enumerate(parts) if i not in drop
            )
            dropped[d] = len(drop)
        docs = docs.set_column(
            docs.column_names.index(text_column),
            text_column,
            pa.array(texts, pa.string()),
        )
    docs = docs.append_column("n_dropped", pa.array(dropped))
    return docs.select(out_schema.names).cast(out_schema)


def line_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_line_length: int = 1,
    num_partitions: int = 16,
    delimiter: str = "\n",
) -> ray.data.Dataset:
    """Cut every non-first exact occurrence of a line (>= ``min_line_length``
    chars) across the whole corpus; returns the input with ``text_column``
    rebuilt plus an ``n_dropped`` column."""
    base = ds.schema().base_schema
    out_schema = pa.schema(
        list(base) + [pa.field("n_dropped", pa.int64())]
    )

    occurrences = ds.map_batches(
        lambda b: _explode_lines(
            b, text_column, id_column, min_line_length, num_partitions, delimiter
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    cuts = hash_partition_exchange(
        occurrences, _PART, num_partitions, lambda g: _losers(g, num_partitions)
    )

    def _stamp_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                list(base) + [pa.field(_PART, pa.int64())]
            ).empty_table()
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        return batch.append_column(
            _PART, pa.array(_id_part(ids, num_partitions))
        )

    docs_p = ds.map_batches(_stamp_part, batch_format="pyarrow", batch_size=None)
    return two_sided_hash_exchange(
        docs_p,
        cuts,
        _PART,
        num_partitions,
        lambda l, r: _rebuild(l, r, text_column, id_column, out_schema, delimiter),
    )
