"""Corpus-composition statistics for training-data planning — the numbers a
curation team computes BEFORE deciding what to dedup, up-sample or drop:

* :func:`temperature_weights` — multilingual temperature-sampling weights
  (the mBERT/XLM-R ``p^alpha`` recipe, Conneau et al. 2019, public): per
  group (language), the exact doc/char totals plus ``pow_alpha =
  n_units**alpha`` and ``sampling_weight = pow_alpha / max(pow_alpha)``.
  Every double is a single libm op on exact integers (one ``pow``, one
  max, one divide), so the engine and a SQL oracle produce bit-identical
  values — no multi-term float sums whose order could differ.

* :func:`shingle_redundancy` — per-group corpus-level n-gram redundancy:
  total sliding n-gram occurrences, exact distinct n-gram count across the
  whole group (cross-document), and ``redundancy = 1 - distinct/total`` —
  the "how much would shingle-level dedup save per source" planning
  metric. Occurrence counts pre-aggregate per block (one row per distinct
  (group, shingle) per block, never per occurrence); shingles travel as
  16-byte md5 keys (same scale contract as line-level dedup in
  ``pipelines/lines.py``); the exchange co-locates every copy of a shingle
  key in one partition so per-partition distinct counts sum to the exact
  global distinct count.

Neither operator exists in the reference (it stops at dedup); both are the
standard upstream planning steps for the corpora the reference dedups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import hash_partition_exchange

_PART = "__cs_part"


def temperature_weights(
    ds: ray.data.Dataset,
    group_column: str = "lang",
    size_column: str = "n_chars",
    alpha: float = 0.3,
) -> pa.Table:
    """Temperature-sampling weights per ``group_column``: exact ``n_docs``
    and ``n_units`` (sum of ``size_column``) per group, ``pow_alpha =
    float(n_units) ** alpha`` and ``sampling_weight = pow_alpha /
    max_over_groups(pow_alpha)``. The whole reduction is one blockwise
    pre-aggregated groupby (O(groups) rows move); only the group-count-sized
    result reaches the driver — languages are bounded (~hundreds), so this
    holds at 100 TB."""
    from .agg import grouped_sum_count

    tiny = grouped_sum_count(
        ds.select_columns([group_column, size_column]),
        [group_column],
        [size_column],
        count_alias="n_docs",
    )
    tbl = pa.concat_tables(
        [pa.Table.from_pydict(b) if isinstance(b, dict) else b
         for b in ray.get(tiny.to_arrow_refs())],
        promote_options="permissive",
    )
    if tbl.num_rows == 0:
        return pa.table(
            {
                group_column: pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_units": pa.array([], pa.int64()),
                "pow_alpha": pa.array([], pa.float64()),
                "sampling_weight": pa.array([], pa.float64()),
            }
        )
    tbl = tbl.sort_by([(group_column, "ascending")])
    n_units = tbl[size_column].to_numpy(zero_copy_only=False).astype(np.int64)
    pw = np.power(n_units.astype(np.float64), np.float64(alpha))
    mx = pw.max()
    # all-zero sizes: SQL's x / max = 0/0 is NULL, numpy's is NaN — emit
    # nulls so the degenerate corpus matches the oracle too
    sw = (
        pa.array([None] * len(pw), pa.float64())
        if mx == 0.0
        else pa.array(pw / mx)
    )
    return pa.table(
        {
            group_column: tbl[group_column],
            "n_docs": tbl["n_docs"].cast(pa.int64()),
            "n_units": pa.array(n_units),
            "pow_alpha": pa.array(pw),
            "sampling_weight": sw,
        }
    )


def _block_windows(batch: pa.Table, text_column: str, ngram: int):
    """Shared vectorized window kernel: tokenize (Arrow lower + split on the
    token-class complement), build all within-doc sliding ``ngram`` windows,
    and find the block-DISTINCT windows on CODE tuples (a void-view
    np.unique) — strings are only materialized later, for distinct windows.

    Returns ``(uniq_toks, uwin_codes, winv, doc_idx)`` — the distinct-token
    array, the [U x n] token-code matrix of distinct windows, each window
    occurrence's distinct-window index, and its source-row index — or
    ``None`` when the block yields no window."""
    if batch.num_rows == 0:
        return None
    import pyarrow.compute as pc

    splits = pc.split_pattern_regex(
        pc.utf8_lower(batch[text_column].combine_chunks()), "[^a-z0-9_]+"
    )
    flat = pc.list_flatten(splits)
    nonempty_m = pc.greater(pc.utf8_length(flat), 0)
    if not pc.any(nonempty_m).as_py():
        return None
    parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
    par = parents[nonempty_m.to_numpy(zero_copy_only=False)].astype(np.int64)
    enc = flat.filter(nonempty_m).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_toks = np.asarray(enc.dictionary.to_pandas(), dtype=object)
    n_tok = len(codes)
    if n_tok < ngram:
        return None
    # window j is valid iff tokens j..j+n-1 belong to the same doc
    valid = par[: n_tok - ngram + 1] == par[ngram - 1 :]
    if not valid.any():
        return None
    starts = np.flatnonzero(valid)
    win = np.empty((len(starts), ngram), np.int64)
    for k in range(ngram):
        win[:, k] = codes[starts + k]
    wv = np.ascontiguousarray(win).view([("", np.int64)] * ngram).ravel()
    uwin, winv = np.unique(wv, return_inverse=True)
    uwin_codes = uwin.view(np.int64).reshape(-1, ngram)
    return uniq_toks, uwin_codes, winv, par[starts]


def _join_windows(uniq_toks: np.ndarray, uwin_codes: np.ndarray) -> np.ndarray:
    """Space-join the distinct windows into gram strings (U-bounded loop —
    the lines.py contract: Python work per block-DISTINCT item only)."""
    return np.array(
        [" ".join(uniq_toks[c] for c in row) for row in uwin_codes], object
    )


def _shingle_partial(
    batch: pa.Table,
    text_column: str,
    group_column: str,
    ngram: int,
    num_partitions: int,
    group_type: pa.DataType,
) -> pa.Table:
    """Distinct (group, shingle-md5) pairs with occurrence counts for one
    block — only the block-DISTINCT shingles are ever joined and md5'd."""
    empty = pa.table(
        {
            group_column: pa.array([], group_type),
            "key": pa.array([], pa.binary(16)),
            "cnt": pa.array([], pa.int64()),
            _PART: pa.array([], pa.int64()),
        }
    )
    w = _block_windows(batch, text_column, ngram)
    if w is None:
        return empty
    uniq_toks, uwin_codes, winv, doc_idx = w
    # group identity per window occurrence = the doc's group value
    genc = batch[group_column].combine_chunks().dictionary_encode()
    gcodes_doc = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    gcode = gcodes_doc[doc_idx]
    n_uwin = len(uwin_codes)
    combo = gcode * n_uwin + winv
    ukey, cnt = np.unique(combo, return_counts=True)
    g_idx = (ukey // n_uwin).astype(np.int64)
    w_idx = (ukey % n_uwin).astype(np.int64)
    # md5 only the block-distinct shingles (the lines.py contract)
    digests = np.empty(n_uwin, object)
    parts = np.empty(n_uwin, np.int64)
    for i, row in enumerate(uwin_codes):
        d = hashlib.md5(" ".join(uniq_toks[c] for c in row).encode()).digest()
        digests[i] = d
        parts[i] = int.from_bytes(d[:8], "little") % num_partitions
    return pa.table(
        {
            group_column: genc.dictionary.take(pa.array(g_idx)),
            "key": pa.array(list(digests[w_idx]), pa.binary(16)),
            "cnt": pa.array(cnt.astype(np.int64)),
            _PART: pa.array(parts[w_idx]),
        }
    )


def shingle_redundancy(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "source",
    ngram: int = 3,
    num_partitions: int = 32,
) -> pa.Table:
    """Per-group shingle-level redundancy over sliding word ``ngram``-grams
    (plain windows — docs shorter than ``ngram`` tokens contribute nothing;
    a group whose docs are all short is absent from the result, matching
    the SQL GROUP BY over exploded windows). Returns ``(group, n_shingles,
    n_distinct_shingles, redundancy)`` where ``redundancy = 1.0 -
    n_distinct/n_shingles``.

    Scale shape: blocks emit one (group, md5-16B, cnt) row per DISTINCT
    shingle per block; the exchange routes by the shingle hash, so one
    partition sees every copy of a shingle and its per-group distinct/total
    partials are exact; only O(partitions x groups) partial rows reach the
    final fold."""
    group_type = ds.schema().base_schema.field(group_column).type

    pre = ds.map_batches(
        lambda b: _shingle_partial(
            b, text_column, group_column, ngram, num_partitions, group_type
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def reduce(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "key" not in group.column_names:
            return pa.table(
                {
                    group_column: pa.array([], group_type),
                    "__tot": pa.array([], pa.int64()),
                    "__dis": pa.array([], pa.int64()),
                }
            )
        pairs = (
            group.select([group_column, "key", "cnt"])
            .group_by([group_column, "key"])
            .aggregate([("cnt", "sum")])
        )
        out = pairs.group_by([group_column]).aggregate(
            [("cnt_sum", "sum"), ("key", "count")]
        )
        return out.rename_columns([group_column, "__tot", "__dis"])

    partials = hash_partition_exchange(pre, _PART, num_partitions, reduce)
    rows = partials.take_all()
    if not rows:
        return pa.table(
            {
                group_column: pa.array([], group_type),
                "n_shingles": pa.array([], pa.int64()),
                "n_distinct_shingles": pa.array([], pa.int64()),
                "redundancy": pa.array([], pa.float64()),
            }
        )
    import pandas as pd

    df = pd.DataFrame(rows).groupby(group_column, as_index=False).sum()
    df = df.sort_values(group_column).reset_index(drop=True)
    tot = df["__tot"].to_numpy(np.int64)
    dis = df["__dis"].to_numpy(np.int64)
    return pa.table(
        {
            group_column: pa.array(df[group_column], group_type),
            "n_shingles": pa.array(tot),
            "n_distinct_shingles": pa.array(dis),
            "redundancy": pa.array(1.0 - (dis.astype(np.float64) / tot)),
        }
    )


def content_checksums(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "source",
    id_column: str | None = None,
) -> pa.Table:
    """Order-independent per-group content checksums — the integrity stamp
    a 100 TB pipeline records next to every export so a re-run, a restore,
    or a migration can be byte-verified without re-reading both copies in
    the same order. Per group: exact row count and ``checksum64`` = the
    wrap-around (mod 2^64) sum of each row's md5-prefix-64 — commutative,
    so any partitioning/order reproduces it, and (unlike XOR) duplicate
    PAIRS don't cancel. When ``id_column`` is given the hashed string is
    ``f"{id}\\x00{text}"`` so reassigning ids is detected too.

    Scale shape: one stateless pass emits a (groups)-sized partial per
    block (two uint64s per group); only O(blocks x groups) rows reach the
    driver fold — group counts are bounded (sources/languages)."""
    import pandas as pd

    group_type = ds.schema().base_schema.field(group_column).type

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_column: pa.array([], group_type),
                "__n": pa.array([], pa.int64()),
                "__ck": pa.array([], pa.uint64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        texts = batch[text_column].to_pylist()
        if id_column is not None:
            ids = batch[id_column].to_pylist()
            keys = (f"{i}\x00{t or ''}".encode() for i, t in zip(ids, texts))
        else:
            keys = ((t or "").encode() for t in texts)
        h = np.fromiter(
            (int(hashlib.md5(k).hexdigest()[:16], 16) for k in keys),
            np.uint64,
            count=batch.num_rows,
        )
        enc = batch[group_column].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ng = len(enc.dictionary)
        n = np.bincount(codes, minlength=ng).astype(np.int64)
        ck = np.zeros(ng, np.uint64)
        np.add.at(ck, codes, h)  # uint64 wraps mod 2^64 by construction
        return pa.table(
            {
                group_column: enc.dictionary,
                "__n": pa.array(n),
                "__ck": pa.array(ck),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).take_all()
    if not rows:
        return pa.table(
            {
                group_column: pa.array([], group_type),
                "n_docs": pa.array([], pa.int64()),
                "checksum64": pa.array([], pa.uint64()),
            }
        )
    df = pd.DataFrame(rows)
    g = df.groupby(group_column, as_index=False).agg(
        n_docs=("__n", "sum"),
        checksum64=("__ck", lambda s: np.sum(s.to_numpy(np.uint64), dtype=np.uint64)),
    )
    g = g.sort_values(group_column).reset_index(drop=True)
    return pa.table(
        {
            group_column: pa.array(g[group_column], group_type),
            "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
            "checksum64": pa.array(g["checksum64"].to_numpy(np.uint64)),
        }
    )


def _ngram_counts_partial(
    batch: pa.Table, text_column: str, ngram: int, num_partitions: int
) -> pa.Table:
    """Block-local (gram, cnt, part) partials — one row per DISTINCT
    ``ngram``-gram per block, via the shared window kernel; only
    block-distinct windows are ever joined into strings."""
    empty = pa.table(
        {
            "gram": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            _PART: pa.array([], pa.int64()),
        }
    )
    w = _block_windows(batch, text_column, ngram)
    if w is None:
        return empty
    uniq_toks, uwin_codes, winv, _doc_idx = w
    cnt = np.bincount(winv, minlength=len(uwin_codes)).astype(np.int64)
    grams = _join_windows(uniq_toks, uwin_codes)
    import pandas as pd

    part = (pd.util.hash_array(grams) % np.uint64(num_partitions)).astype(np.int64)
    return pa.table(
        {
            "gram": pa.array(grams, pa.string()),
            "cnt": pa.array(cnt),
            _PART: pa.array(part),
        }
    )


def explode_distinct_shingles(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "source",
    ngram: int = 3,
) -> ray.data.Dataset:
    """Block-distinct ``(group, gram)`` pairs — the streaming input for
    sketch-based shingle statistics. Emitting only the block-DISTINCT
    pairs is LOSSLESS for sketches whose merge is a max/presence fold
    (HLL registers: a duplicate occurrence can never raise a register's
    max rank), and bounds the exploded volume by block-distinct grams,
    never occurrences."""
    group_type = ds.schema().base_schema.field(group_column).type

    def f(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_column: pa.array([], group_type),
                "gram": pa.array([], pa.string()),
            }
        )
        w = _block_windows(batch, text_column, ngram)
        if w is None:
            return empty
        uniq_toks, uwin_codes, winv, doc_idx = w
        genc = batch[group_column].combine_chunks().dictionary_encode()
        gcodes_doc = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gcode = gcodes_doc[doc_idx]
        n_uwin = len(uwin_codes)
        upair = np.unique(gcode * n_uwin + winv)
        g_idx = (upair // n_uwin).astype(np.int64)
        w_idx = (upair % n_uwin).astype(np.int64)
        grams = _join_windows(uniq_toks, uwin_codes)
        return pa.table(
            {
                group_column: genc.dictionary.take(pa.array(g_idx)),
                "gram": pa.array(grams[w_idx], pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def shingle_hll_registers(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "source",
    ngram: int = 3,
    precision: int = 8,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """The 100 TB scale path for :func:`shingle_redundancy`'s distinct
    count: per-group HyperLogLog registers over the shingle stream.
    Exact distinct counting moves one 16-byte key per block-distinct
    shingle; the sketch moves only fixed-size integer registers — at
    web scale that is the difference between a corpus-sized exchange and
    a KB-sized one. The register table is all-integer, exactly
    partition-invariant, and SQL-recomputable (the oracle surface, same
    contract as ``events_user_hll_registers``)."""
    from .sketch import hll_registers

    pairs = explode_distinct_shingles(ds, text_column, group_column, ngram)
    return hll_registers(
        pairs, "gram", key=group_column, precision=precision,
        num_partitions=num_partitions,
    )


def shingle_count_approx(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "source",
    ngram: int = 3,
    precision: int = 12,
    num_partitions: int = 8,
    alias: str = "approx_distinct_shingles",
) -> ray.data.Dataset:
    """Approximate per-group distinct-shingle count from the HLL fold —
    the estimate companion to :func:`shingle_hll_registers` (error bound
    ~1.04/sqrt(2^precision), pytest-checked against the exact counts)."""
    from .sketch import approx_count_distinct

    pairs = explode_distinct_shingles(ds, text_column, group_column, ngram)
    return approx_count_distinct(
        pairs, "gram", key=group_column, precision=precision,
        num_partitions=num_partitions, alias=alias,
    )


def _novelty_partial(
    batch: pa.Table,
    text_column: str,
    id_column: str,
    ngram: int,
    num_partitions: int,
    id_type: pa.DataType,
) -> pa.Table:
    """Distinct ``(doc, shingle-md5)`` pairs for one block. A document is
    one row, so its shingles never span blocks — a block-distinct (doc,
    shingle) pair is GLOBALLY distinct, which is what makes the downstream
    per-key doc counts exact without a dedup pass."""
    empty = pa.table(
        {
            id_column: pa.array([], id_type),
            "key": pa.array([], pa.binary(16)),
            _PART: pa.array([], pa.int64()),
        }
    )
    w = _block_windows(batch, text_column, ngram)
    if w is None:
        return empty
    uniq_toks, uwin_codes, winv, doc_idx = w
    n_uwin = len(uwin_codes)
    upair = np.unique(doc_idx.astype(np.int64) * n_uwin + winv)
    d_idx = (upair // n_uwin).astype(np.int64)
    w_idx = (upair % n_uwin).astype(np.int64)
    # md5 only the block-distinct shingles (the lines.py contract)
    digests = np.empty(n_uwin, object)
    parts = np.empty(n_uwin, np.int64)
    for i, row in enumerate(uwin_codes):
        d = hashlib.md5(" ".join(uniq_toks[c] for c in row).encode()).digest()
        digests[i] = d
        parts[i] = int.from_bytes(d[:8], "little") % num_partitions
    ids = batch[id_column].combine_chunks().take(pa.array(d_idx))
    return pa.table(
        {
            id_column: ids,
            "key": pa.array(list(digests[w_idx]), pa.binary(16)),
            _PART: pa.array(parts[w_idx]),
        }
    )


def doc_shingle_novelty(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    ngram: int = 3,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-DOCUMENT shingle novelty — the dup-ratio curation signal
    (RefinedWeb/Gopher-style): over each doc's DISTINCT word
    ``ngram``-grams, how many also appear in at least one OTHER document,
    and ``novelty = 1 - n_shared / n_distinct`` (1.0 = every shingle
    unique to this doc, 0.0 = every shingle seen elsewhere). Docs with
    fewer than ``ngram`` tokens emit no shingles and are absent (the SQL
    GROUP BY over exploded windows).

    Scale shape: blocks emit one (doc_id, md5-16B) row per doc-distinct
    shingle — text never leaves its block; the first exchange co-locates
    every copy of a shingle key, where the per-key document count is exact
    (each (doc, key) row is globally unique because a doc is one row in
    one block) and folds to per-doc (distinct, shared) partials; the
    second exchange co-locates each doc's O(partitions) partials by doc-id
    hash. Returns a Dataset of ``(id, n_distinct, n_shared, novelty)`` —
    novelty is one divide + subtract on exact int64 counts, bit-identical
    to the SQL oracle.
    """
    from ..stages.exchange import distinct_key_partition

    id_type = ds.schema().base_schema.field(id_column).type

    pre = ds.map_batches(
        lambda b: _novelty_partial(
            b, text_column, id_column, ngram, num_partitions, id_type
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def reduce_shingles(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], id_type),
                "dis": pa.array([], pa.int64()),
                "shr": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        kenc = group["key"].combine_chunks().dictionary_encode()
        kcodes = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ndocs = np.bincount(kcodes)  # rows are globally unique (doc, key) pairs
        shared = (ndocs[kcodes] >= 2).astype(np.int64)
        denc = group[id_column].combine_chunks().dictionary_encode()
        dcodes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_doc = len(denc.dictionary)
        dis = np.bincount(dcodes, minlength=n_doc).astype(np.int64)
        shr = np.bincount(dcodes, weights=shared, minlength=n_doc).astype(np.int64)
        part2 = distinct_key_partition(
            denc.dictionary.to_numpy(zero_copy_only=False), num_partitions
        )
        return pa.table(
            {
                id_column: denc.dictionary,
                "dis": pa.array(dis),
                "shr": pa.array(shr),
                _PART: pa.array(part2.astype(np.int64)),
            }
        )

    def reduce_docs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], id_type),
                "n_distinct": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
                "novelty": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or "dis" not in group.column_names:
            return empty
        denc = group[id_column].combine_chunks().dictionary_encode()
        dcodes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_doc = len(denc.dictionary)
        dis = np.bincount(
            dcodes, weights=group["dis"].to_numpy(zero_copy_only=False),
            minlength=n_doc,
        ).astype(np.int64)
        shr = np.bincount(
            dcodes, weights=group["shr"].to_numpy(zero_copy_only=False),
            minlength=n_doc,
        ).astype(np.int64)
        return pa.table(
            {
                id_column: denc.dictionary,
                "n_distinct": pa.array(dis),
                "n_shared": pa.array(shr),
                "novelty": pa.array(1.0 - shr.astype(np.float64) / dis),
            }
        )

    partials = hash_partition_exchange(pre, _PART, num_partitions, reduce_shingles)
    return hash_partition_exchange(partials, _PART, num_partitions, reduce_docs)


def top_frequent_ngrams(
    ds: ray.data.Dataset,
    text_column: str = "text",
    ngram: int = 2,
    n: int = 100,
    num_partitions: int = 32,
) -> pa.Table:
    """EXACT corpus-wide top-``n`` most frequent word ``ngram``-grams,
    (gram, cnt) ordered by cnt desc then gram asc — the phrase-level heavy
    hitters that drive boilerplate detection and stop-phrase lists (the
    n>1 sibling of ``textops.top_frequent_tokens``).

    Scale shape: blocks emit one (gram, cnt) row per block-DISTINCT gram;
    the exchange co-locates every copy of a gram so per-partition sums are
    exact; each partition keeps its local top-n (the global top-n is a
    subset of the union) and the driver folds P x n candidates."""
    pre = ds.map_batches(
        lambda b: _ngram_counts_partial(b, text_column, ngram, num_partitions),
        batch_format="pyarrow",
        batch_size=None,
    )

    def reduce(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "gram" not in group.column_names:
            return empty
        summed = (
            group.select(["gram", "cnt"]).group_by(["gram"]).aggregate([("cnt", "sum")])
        )
        s = summed.sort_by([("cnt_sum", "descending"), ("gram", "ascending")])
        return pa.table(
            {"gram": s["gram"], "cnt": s["cnt_sum"].cast(pa.int64())}
        ).slice(0, n)

    cand = hash_partition_exchange(pre, _PART, num_partitions, reduce).to_pandas()
    if cand.empty:
        return pa.table(
            {"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    cand = cand.sort_values(
        ["cnt", "gram"], ascending=[False, True], kind="stable"
    ).head(n)
    return pa.table(
        {
            "gram": pa.array(cand["gram"].tolist(), pa.string()),
            "cnt": pa.array(cand["cnt"].to_numpy(), pa.int64()),
        }
    )


def dup_mass_by_group(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "source",
    id_column: str | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Duplicate-mass report: per group (source/domain/shard), how many docs
    there are and how many are exact-duplicate LOSERS (their text's
    min-row-id winner lives elsewhere — possibly in another group). This is
    the standard "which sources would exact dedup shrink, and by how much"
    planning table; SQL oracle::

        SELECT source, count(*) AS n_docs,
               sum(CASE WHEN doc_id <> m THEN 1 ELSE 0 END) AS n_dups
        FROM (SELECT doc_id, source,
                     min(doc_id) OVER (PARTITION BY text) AS m FROM documents)
        GROUP BY source

    Scale shape: blocks pre-reduce to one ``(md5-16B, group, count,
    min_row_id)`` partial per distinct (text, group) per block — raw text
    never leaves its block; partials co-locate by content-hash so each
    partition resolves winners exactly; only ``(group, n_docs, n_dups)``
    partials (O(partitions × groups) rows) feed the final fold.
    """
    from ..sources.io import ROW_ID, stamp_row_ids_from_key
    from .agg import grouped_sum_count
    from .exact import _hash_view, add_content_hash

    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    elif ROW_ID not in ds.schema().names:
        raise ValueError("dataset must have a row_id column or pass id_column")
    hash_col = "__dm_hash"
    hashed = add_content_hash(
        ds.select_columns([text_column, group_column, ROW_ID]),
        text_column,
        hash_col,
    )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h1": pa.array([], pa.uint64()),
                "h2": pa.array([], pa.uint64()),
                group_column: pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "mrid": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        n = batch.num_rows
        hv = _hash_view(batch[hash_col], n)
        hu = np.frombuffer(hv.tobytes(), dtype=np.uint64).reshape(n, 2)
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        gvals = np.array(
            [str(v) for v in batch[group_column].to_pylist()], dtype=object
        )
        guniq, g = np.unique(gvals, return_inverse=True)
        order = np.lexsort((rid, g, hu[:, 1], hu[:, 0]))
        h1, h2, gs, rs = hu[order, 0], hu[order, 1], g[order], rid[order]
        brk = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1]) | (gs[1:] != gs[:-1])]
        starts = np.flatnonzero(brk)
        cnt = np.diff(np.r_[starts, n])
        mrid = rs[starts]  # rid ascending within each (hash, group) run
        part = (h1[starts] % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "h1": pa.array(h1[starts]),
                "h2": pa.array(h2[starts]),
                group_column: pa.array(guniq[gs[starts]].tolist(), pa.string()),
                "cnt": pa.array(cnt.astype(np.int64)),
                "mrid": pa.array(mrid),
                "part": pa.array(part),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_column: pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_dups": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "h1" not in group.column_names:
            return empty
        h1 = group["h1"].to_numpy(zero_copy_only=False)
        h2 = group["h2"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        mrid = group["mrid"].to_numpy(zero_copy_only=False).astype(np.int64)
        gvals = np.array(group[group_column].to_pylist(), dtype=object)
        guniq, g = np.unique(gvals, return_inverse=True)
        # winner per hash = the row with the global min row_id
        order = np.lexsort((mrid, h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        winner_rows = order[first]
        docs = np.bincount(g, weights=cnt, minlength=len(guniq)).astype(np.int64)
        wins = np.bincount(g[winner_rows], minlength=len(guniq)).astype(np.int64)
        return pa.table(
            {
                group_column: pa.array(guniq.tolist(), pa.string()),
                "n_docs": pa.array(docs),
                "n_dups": pa.array(docs - wins),
            }
        )

    partials = hashed.map_batches(partial, batch_format="pyarrow", batch_size=None)
    per_part = hash_partition_exchange(partials, "part", num_partitions, fold)
    out = grouped_sum_count(
        per_part, [group_column], ["n_docs", "n_dups"], count_alias="__np"
    )
    return out.map_batches(
        lambda t: t.drop_columns(["__np"]), batch_format="pyarrow"
    )


def bigram_pmi(
    ds: ray.data.Dataset,
    text_column: str = "text",
    n: int = 100,
    num_partitions: int = 32,
    round_to: int = 6,
) -> pa.Table:
    """Collocation scores: pointwise mutual information ``ln(p(ab) /
    (p(a) p(b)))`` for the corpus-wide top-``n`` most frequent word
    bigrams — the standard "is this phrase a real collocation or just two
    frequent words" statistic for stop-phrase and boilerplate lists.

    Scale shape: the bigram heavy hitters come from the pruned
    :func:`top_frequent_ngrams` exchange; their <= 2n member words form a
    tiny vocabulary that is CLOSED OVER once (broadcast, not re-shipped
    per row), so the unigram pass emits only O(blocks x 2n) partial rows
    plus two total counters per block; everything global the driver sees
    is the (n + 2n + 2)-row fold."""
    top = top_frequent_ngrams(ds, text_column, ngram=2, n=n,
                              num_partitions=num_partitions)
    grams = top["gram"].to_pylist()
    cnts = np.asarray(top["cnt"].to_pylist(), np.int64)
    vocab_arr = np.array(sorted({w for g in grams for w in g.split(" ")}), object)

    # '#' is outside the [a-z0-9_]+ token class, so these keys can never
    # collide with a real token (NB: NUL-prefixed sentinels are corrupted
    # by Ray's block builder on this Ray version — stay printable)
    _T1, _T2 = "#tokens", "#bigrams"

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"k": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
        w = _block_windows(batch, text_column, 1)
        if w is None:
            return empty
        uniq_toks, uwin_codes, winv, doc_idx = w
        occ = np.bincount(winv, minlength=len(uwin_codes)).astype(np.int64)
        tot_tokens = int(occ.sum())
        # bigram-occurrence total: windows of size 2 = consecutive tokens
        # within a doc; recompute cheaply from the same token stream
        w2 = _block_windows(batch, text_column, 2)
        tot_bigrams = 0 if w2 is None else int(len(w2[2]))
        tok_of_win = uniq_toks[uwin_codes[:, 0]]
        m = np.isin(tok_of_win, vocab_arr)
        ks = tok_of_win[m].tolist()
        cs = occ[m].tolist()
        return pa.table(
            {
                "k": pa.array(ks + [_T1, _T2], pa.string()),
                "c": pa.array(cs + [tot_tokens, tot_bigrams], pa.int64()),
            }
        )

    # partial rows are O(blocks x 2n): a driver-side fold of the partials
    # is the scale design, not a shortcut
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    agg = partials.to_pandas().groupby("k")["c"].sum()
    t1 = float(agg.get(_T1, 0))
    t2 = float(agg.get(_T2, 0))
    pmi = np.empty(len(grams), np.float64)
    for i, (g, c_ab) in enumerate(zip(grams, cnts)):
        a, b = g.split(" ")
        pmi[i] = np.log(
            (c_ab / t2) / ((float(agg[a]) / t1) * (float(agg[b]) / t1))
        )
    return pa.table(
        {
            "gram": pa.array(grams, pa.string()),
            "cnt": pa.array(cnts),
            "pmi": pa.array(np.round(pmi, round_to)),
        }
    )


def token_entropy_by_group(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "lang",
    num_partitions: int = 16,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Per-group token Shannon entropy ``H = ln(T) - (sum c ln c) / T``
    over the exact corpus-wide token distribution — the
    lexical-diversity signal for mixture planning (a low-entropy source
    is boilerplate-heavy even when its dedup rate is low).

    Scale shape: the :func:`_shingle_partial` kernel (ngram=1) emits one
    (group, token-md5, cnt) row per block-distinct token; the token-hash
    exchange makes per-partition (group, token) sums exact, and each
    partition folds them to TWO floats per group (``sum c`` and
    ``sum c ln c``) — the entropy join is over O(P x groups) rows."""
    group_type = ds.schema().base_schema.field(group_column).type

    pre = ds.map_batches(
        lambda b: _shingle_partial(
            b, text_column, group_column, 1, num_partitions, group_type
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_column: pa.array([], group_type),
                "T": pa.array([], pa.float64()),
                "s": pa.array([], pa.float64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        summed = (
            group.select([group_column, "key", "cnt"])
            .group_by([group_column, "key"])
            .aggregate([("cnt", "sum")])
        )
        gvals = np.array(summed[group_column].to_pylist(), dtype=object)
        c = summed["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        guniq, g = np.unique(gvals, return_inverse=True)
        T = np.bincount(g, weights=c, minlength=len(guniq))
        s = np.bincount(g, weights=c * np.log(c), minlength=len(guniq))
        return pa.table(
            {
                group_column: pa.array(guniq.tolist(), group_type),
                "T": pa.array(T),
                "s": pa.array(s),
                _PART: pa.array(np.zeros(len(guniq), np.int64)),
            }
        )

    def total(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_column: pa.array([], group_type),
                "token_entropy": pa.array([], pa.float64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "T" not in group.column_names:
            return empty
        gvals = np.array(group[group_column].to_pylist(), dtype=object)
        T = group["T"].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        guniq, g = np.unique(gvals, return_inverse=True)
        Tg = np.bincount(g, weights=T, minlength=len(guniq))
        sg = np.bincount(g, weights=s, minlength=len(guniq))
        H = np.where(Tg > 0, np.log(np.maximum(Tg, 1)) - sg / np.maximum(Tg, 1), 0.0)
        return pa.table(
            {
                group_column: pa.array(guniq.tolist(), group_type),
                "token_entropy": pa.array(np.round(H, round_to)),
                "n_tokens": pa.array(Tg.astype(np.int64)),
            }
        )

    per_part = hash_partition_exchange(pre, _PART, num_partitions, fold)
    return hash_partition_exchange(per_part, _PART, 1, total)
