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


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain) — vectorized 64-bit mixing."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _id_part(vals: np.ndarray, num_partitions: int) -> np.ndarray:
    """Doc-id partition: vectorized splitmix64 for integer ids, sha1
    fallback for anything else. Both sides of the rebuild exchange use
    this same function, so the choice is internal."""
    vals = np.asarray(vals)
    if np.issubdtype(vals.dtype, np.integer):
        return (_mix64(vals) % np.uint64(num_partitions)).astype(np.int64)
    import pandas as pd

    h = pd.util.hash_array(vals.astype(object))  # vectorized siphash
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _explode_lines(
    batch: pa.Table,
    text_column: str,
    id_column: str,
    min_line_length: int,
    num_partitions: int,
    delimiter: str,
    id_type: pa.DataType | None = None,
) -> pa.Table:
    """(doc_id, line_no, 16B line key, part) for every qualifying line."""
    # id_type comes from the dataset schema at build time — an empty block
    # must not emit a hardcoded-int64 partial for a non-int64 id column
    if id_type is None:
        id_type = (
            batch.schema.field(id_column).type
            if id_column in batch.column_names
            else pa.int64()
        )
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
    idx = np.flatnonzero(qual)
    lines = flat.take(pa.array(idx)).to_pylist()  # convert qualifiers only
    keys = [hashlib.md5(l.encode()).digest() for l in lines]
    kw = np.frombuffer(b"".join(k[:8] for k in keys), dtype="<u8")
    part = (kw % np.uint64(num_partitions)).astype(np.int64)
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
    # 16-byte keys -> two uint64 words: integer lexsort, no object compares
    buf = b"".join(group["key"].to_pylist())
    kw = np.frombuffer(buf, dtype=">u8").reshape(-1, 2)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    lns = group["line_no"].to_numpy(zero_copy_only=False)
    if np.issubdtype(ids.dtype, np.number):
        id_key = ids
    else:
        # factorize string ids (O(n) hashing), order-rank only the uniques
        import pandas as pd

        codes, uniques = pd.factorize(ids)
        rank = np.empty(len(uniques), np.int64)
        rank[np.argsort(uniques, kind="stable")] = np.arange(len(uniques))
        id_key = rank[codes]
    order = np.lexsort((lns, id_key, kw[:, 1], kw[:, 0]))
    sk = kw[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (sk[1:, 0] != sk[:-1, 0]) | (sk[1:, 1] != sk[:-1, 1])
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
        # group cuts by doc with one vectorized lexsort; the remaining
        # Python work is one split/join per CUT DOC, not per cut line
        corder = np.lexsort((cut_lns, doc_idx))
        sd, sl = doc_idx[corder], cut_lns[corder]
        starts = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
        ends = np.r_[starts[1:], len(sd)]
        for s, e in zip(starts, ends):
            d = int(sd[s])
            parts = texts[d].split(delimiter)
            drop = set(sl[s:e].tolist())
            texts[d] = delimiter.join(
                p for i, p in enumerate(parts) if i not in drop
            )
            dropped[d] = e - s
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
            b,
            text_column,
            id_column,
            min_line_length,
            num_partitions,
            delimiter,
            base.field(id_column).type,
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


def dedup_lines_within(
    ds: ray.data.Dataset,
    text_column: str = "text",
    sep: str = "\n",
    min_line_length: int = 4,
    dropped_alias: str = "n_dropped",
) -> ray.data.Dataset:
    """WITHIN-document line dedup (the per-doc half of the C4 recipe —
    Gopher's "fraction of duplicate lines" gate, applied as a cut): each
    document keeps only the FIRST occurrence of every repeated line of at
    least ``min_line_length`` chars; shorter lines are kept verbatim.

    Unlike :func:`line_dedup` (corpus-wide, needs a key exchange) this is
    embarrassingly parallel — one stateless vectorized ``map_batches``
    pass, zero shuffle, payload never moves: Arrow ``split_pattern`` ->
    within-(doc, line) first-occurrence mask via one stable argsort over
    ``parent * n_distinct + code`` -> ``binary_join`` rebuild.

    SQL parity: ``row_number() OVER (PARTITION BY doc_id, line ORDER BY
    line_no) = 1 OR length(line) < min_line_length``, rebuilt with
    ``string_agg(line, sep ORDER BY line_no)``.
    """

    def cut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = batch.set_column(
                batch.column_names.index(text_column),
                text_column,
                pa.array([], pa.string()),
            )
            return t.append_column(dropped_alias, pa.array([], pa.int64()))
        splits = pc.split_pattern(
            batch[text_column].combine_chunks(), sep
        )
        flat = pc.list_flatten(splits)
        parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = parents.astype(np.int64) * np.int64(len(enc.dictionary)) + codes
        order = np.argsort(key, kind="stable")  # stable => line_no order
        dup = np.zeros(len(key), bool)
        dup[order[1:]] = key[order[1:]] == key[order[:-1]]
        qual = (
            pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            >= min_line_length
        )
        drop = dup & qual
        keep = ~drop
        n = batch.num_rows
        kept_counts = np.bincount(parents[keep], minlength=n)
        offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
        rebuilt_lists = pa.ListArray.from_arrays(
            pa.array(offsets), flat.filter(pa.array(keep))
        )
        rebuilt = pc.binary_join(
            rebuilt_lists.cast(pa.list_(pa.string())), sep
        )
        dropped = np.bincount(parents[drop], minlength=n).astype(np.int64)
        out = batch.set_column(
            batch.column_names.index(text_column), text_column, rebuilt
        )
        return out.append_column(dropped_alias, pa.array(dropped))

    return ds.map_batches(cut, batch_format="pyarrow", batch_size=None)
