"""Distributed TF-IDF: corpus document frequencies joined back to per-doc
term counts, scored, and pruned to each document's top-k terms — the
keyword-extraction / lexical-representation primitive of a training-data
pipeline (quality filters, topic buckets, BM25-ish retrieval all start
here).

Scale shape (two narrow exchanges, no sort-based shuffle, payload text
never moves):

1. term counts — stateless ``map_batches``: tokenize each block with the
   corpus tokenizer regex and emit one ``(doc_id, token, tf)`` row per
   distinct (doc, token). Docs never split across blocks, so these rows
   are globally unique — the DF of a token is simply the number of its
   rows.
2. DF join — co-locate every row of a token by token hash; one fold per
   partition counts rows per token (= exact global DF), stamps
   ``score = tf * ln(N / df)`` and re-keys rows by doc-id hash.
3. top-k — co-locate each doc's scored rows by doc hash; one lexsort fold
   keeps the k best per doc with a deterministic (rounded-score desc,
   token asc) order and a 1-based rank.

The rank is computed on the ROUNDED score in both this engine and the SQL
oracle so cross-system float ulp noise can never flip an ordering.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import hash_partition_exchange

TOKEN_RE = re.compile(r"[a-z0-9_]+")
_PART = "__tfidf_part"


def _spart(vals, num_partitions: int) -> np.ndarray:
    """Vectorized partition hash (siphash via pandas). Internal only —
    both the emit side and the re-key side of each exchange call this
    same function, so the choice never surfaces in results."""
    import pandas as pd

    arr = np.asarray(vals)
    if arr.dtype != object:
        arr = arr.astype(object) if arr.dtype.kind in "US" else arr
    h = pd.util.hash_array(arr)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _term_counts(
    batch: pa.Table,
    text_column: str,
    id_column: str,
    num_partitions: int,
    id_type: pa.DataType | None = None,
) -> pa.Table:
    # id_type comes from the dataset schema at pipeline-build time so an
    # empty block can't emit a schema-mismatched partial (hardcoded int64
    # would break non-default-typed ids at concat/unify time)
    if id_type is None:
        id_type = (
            batch.schema.field(id_column).type
            if id_column in batch.column_names
            else pa.int64()
        )
    empty = pa.table(
        {
            "doc_id": pa.array([], id_type),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            _PART: pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    # findall('[a-z0-9_]+') == split on its complement: fully Arrow-side
    import pyarrow.compute as pc

    splits = pc.split_pattern_regex(
        pc.utf8_lower(batch[text_column].combine_chunks()), "[^a-z0-9_]+"
    )
    flat = pc.list_flatten(splits)
    nonempty_m = pc.greater(pc.utf8_length(flat), 0)
    if not pc.any(nonempty_m).as_py():
        return empty
    parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
    par = parents[nonempty_m.to_numpy(zero_copy_only=False)].astype(np.int64)
    # native dictionary encode — only the DISTINCT tokens ever become
    # Python objects (for the partition hash), never the token stream
    enc = flat.filter(nonempty_m).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = enc.dictionary
    nv = len(uniques)
    # count (doc, token) pairs with one bincount over combined codes
    combo = par * nv + codes
    ukey, tf = np.unique(combo, return_counts=True)
    doc_idx = (ukey // nv).astype(np.int64)
    tok_idx = (ukey % nv).astype(np.int64)
    upart = _spart(np.asarray(uniques.to_pandas(), dtype=object), num_partitions)
    return pa.table(
        {
            "doc_id": batch[id_column].take(pa.array(doc_idx)),
            "token": uniques.take(pa.array(tok_idx)),
            "tf": pa.array(tf.astype(np.int64)),
            _PART: pa.array(upart[tok_idx]),
        }
    )


def _df_join(
    group: pa.Table, n_docs: int, num_partitions: int, round_to: int
) -> pa.Table:
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            _PART: pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0 or "token" not in group.column_names:
        return empty
    import pyarrow.compute as pc

    # rows are globally-unique (doc, token) pairs, so DF(token) == its row
    # count here; dictionary-encode natively instead of np.unique(object)
    enc = group["token"].combine_chunks().dictionary_encode()
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = np.bincount(inv, minlength=len(enc.dictionary))
    df = cnt[inv].astype(np.int64)
    tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
    score = np.round(tf * np.log(float(n_docs) / df), round_to)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": group["doc_id"].combine_chunks(),
            "token": group["token"].combine_chunks(),
            "tf": group["tf"].combine_chunks(),
            "df": pa.array(df),
            "score": pa.array(score),
            _PART: pa.array(_spart(ids, num_partitions)),
        }
    )


def _topk(group: pa.Table, k: int) -> pa.Table:
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "rk": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0 or "doc_id" not in group.column_names:
        return empty
    import pyarrow.compute as pc

    # native multi-key sort: (doc asc, score desc, token asc) — the sort
    # is total because (doc, token) rows are unique, so no object-array
    # lexsort is needed
    order_arr = pc.sort_indices(
        group,
        sort_keys=[
            ("doc_id", "ascending"),
            ("score", "descending"),
            ("token", "ascending"),
        ],
    )
    order = order_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    sids = group["doc_id"].to_numpy(zero_copy_only=False)[order]
    newgrp = np.ones(len(sids), dtype=bool)
    newgrp[1:] = sids[1:] != sids[:-1]
    grp_start = np.maximum.accumulate(
        np.where(newgrp, np.arange(len(sids)), 0)
    )
    rk = np.arange(len(sids)) - grp_start + 1
    keep = rk <= k
    sel = order[keep]
    out = group.drop_columns([_PART]).take(pa.array(sel))
    return out.append_column("rk", pa.array(rk[keep].astype(np.int64)))


def tfidf_top_terms(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 5,
    num_partitions: int = 16,
    round_to: int = 6,
    n_docs: int | None = None,
) -> ray.data.Dataset:
    """Top-``k`` TF-IDF terms per document: ``(doc_id, token, tf, df,
    score, rk)`` with ``score = round(tf * ln(N/df), round_to)`` and rank
    ordered by (score desc, token asc). Pass ``n_docs`` to skip the
    counting pass when the caller already knows N."""
    if n_docs is None:
        n_docs = ds.count()
    id_type = ds.schema().base_schema.field(id_column).type
    counts = ds.map_batches(
        lambda b: _term_counts(b, text_column, id_column, num_partitions, id_type),
        batch_format="pyarrow",
        batch_size=None,
    )
    scored = hash_partition_exchange(
        counts,
        _PART,
        num_partitions,
        lambda g: _df_join(g, n_docs, num_partitions, round_to),
    )
    return hash_partition_exchange(
        scored, _PART, num_partitions, lambda g: _topk(g, k)
    )


def bm25_topk(
    ds: ray.data.Dataset,
    queries: dict[str, str],
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    num_partitions: int = 8,
    round_to: int = 4,
) -> ray.data.Dataset:
    """BM25 retrieval for a small named query set: ``(query, doc_id,
    score, rk)`` — the top-``k`` corpus docs per query.

    Scale shape: ONE tokenize pass emits a narrow per-doc (id, dl,
    dense query-vocab tf vector) table that is materialized once; corpus
    stats (N, total length, query-token DF — never the full vocabulary)
    fold from per-block integer partials of that table, and the scoring
    pass reads it again (no second regex pass over the corpus text),
    broadcasts the tiny (query-token -> idf) map, keeps each block's
    local top-k per query, and one exchange folds O(blocks x queries x k)
    candidate rows to the global top-k. Payload text never shuffles;
    ranks are computed on the ROUNDED score (ties -> smallest doc id) so
    the SQL oracle can reproduce them.

    Uses the Lucene/ATIRE BM25 idf ``ln(1 + (N - df + .5)/(df + .5))``
    (Robertson-Sparck Jones with the +1 floor).
    """
    qtokens: dict[str, list[str]] = {
        name: list(dict.fromkeys(TOKEN_RE.findall(q.lower())))
        for name, q in queries.items()
    }
    vocab = sorted({t for toks in qtokens.values() for t in toks})

    vocab_set = pa.array(vocab, pa.string())

    def _vocab_hits(batch: pa.Table):
        """Vectorized tokenize (Arrow split) + vocab match (native
        ``pc.index_in`` against the query vocabulary — the token stream
        never becomes Python objects): returns (per-row token lengths,
        doc-index array, vocab-index array) for vocab-token occurrences."""
        import pyarrow.compute as pc

        splits = pc.split_pattern_regex(
            pc.utf8_lower(batch[text_column].combine_chunks()), "[^a-z0-9_]+"
        )
        flat = pc.list_flatten(splits)
        parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        dl = np.bincount(
            parents[nonempty], minlength=batch.num_rows
        ).astype(np.int64)
        if not len(vocab) or not nonempty.any():
            return dl, np.empty(0, np.int64), np.empty(0, np.int64)
        pos = pc.index_in(flat, value_set=vocab_set).fill_null(-1)
        pos_np = pos.to_numpy(zero_copy_only=False).astype(np.int64)
        hit = pos_np >= 0
        return dl, parents[hit].astype(np.int64), pos_np[hit]

    V = len(vocab)
    id_type = ds.schema().base_schema.field(id_column).type

    # ---- the ONLY tokenize pass: one row per doc — (id, dl, dense
    # per-vocab-token tf vector). Both the stats fold and the scoring pass
    # read this narrow materialized table, so the corpus text is tokenized
    # exactly once (the second regex pass over 100 TB was pure waste).
    # Dense V ints per doc is fine because queries is a SMALL named set;
    # dl is counted INDEPENDENT of the vocab so an all-stopword query set
    # still ranks zero-scored docs instead of collapsing to empty.
    def narrow_partial(batch: pa.Table) -> pa.Table:
        cols = {
            id_column: pa.array([], id_type),
            "dl": pa.array([], pa.int64()),
        }
        if V:
            cols["tfs"] = pa.array([], pa.list_(pa.int32(), V))
        empty = pa.table(cols)
        if batch.num_rows == 0:
            return empty
        dl, doc_idx, tok_idx = _vocab_hits(batch)
        out = {
            id_column: batch[id_column].combine_chunks(),
            "dl": pa.array(dl),
        }
        if V:
            tfm = np.zeros((batch.num_rows, V), np.int32)
            if len(doc_idx):
                combo, cnt = np.unique(
                    doc_idx * V + tok_idx, return_counts=True
                )
                tfm[combo // V, combo % V] = cnt.astype(np.int32)
            out["tfs"] = pa.FixedSizeListArray.from_arrays(
                pa.array(tfm.reshape(-1), pa.int32()), V
            )
        return pa.table(out)

    narrow = ds.map_batches(
        narrow_partial, batch_format="pyarrow", batch_size=None
    ).materialize()

    # ---- stats fold from the narrow table (tiny integer partials)
    def stats_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "df": pa.array([], pa.list_(pa.int64(), max(V, 1))),
                "n_docs": pa.array([], pa.int64()),
                "total_len": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        if V:
            tfm = (
                batch["tfs"]
                .combine_chunks()
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(batch.num_rows, V)
            )
            df = (tfm > 0).sum(axis=0).astype(np.int64)
        else:
            df = np.zeros(1, np.int64)
        return pa.table(
            {
                "df": pa.FixedSizeListArray.from_arrays(
                    pa.array(df, pa.int64()), max(V, 1)
                ),
                "n_docs": pa.array([np.int64(batch.num_rows)]),
                "total_len": pa.array(
                    [pc.sum(batch["dl"]).as_py() or 0], pa.int64()
                ),
            }
        )

    sdf = narrow.map_batches(
        stats_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if len(sdf):
        n_docs = int(sdf["n_docs"].sum())
        total_len = int(sdf["total_len"].sum())
        df_tot = np.sum(np.stack(sdf["df"].to_numpy()), axis=0).astype(np.int64)
    else:  # empty corpus
        n_docs, total_len, df_tot = 0, 0, np.zeros(max(V, 1), np.int64)
    if n_docs == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query": pa.array([], pa.string()),
                    id_column: pa.array([], id_type),
                    "score": pa.array([], pa.float64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        )
    # token-free corpus: dl is all-zero too, any positive avgdl gives the
    # same zero scores without a 0/0
    avgdl = (float(total_len) / float(n_docs)) or 1.0
    df_map = dict(zip(vocab, df_tot[:V].tolist()))
    idf = {
        t: math.log(1.0 + (n_docs - df_map.get(t, 0) + 0.5) / (df_map.get(t, 0) + 0.5))
        for t in vocab
    }
    plan_ref = ray.put((qtokens, idf))

    # ---- pass 2 over the NARROW table (no re-tokenize): score,
    # block-local top-k per query, one tiny exchange
    def score_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query": pa.array([], pa.string()),
                id_column: pa.array([], id_type),
                "score": pa.array([], pa.float64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        qt, idf_l = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        n = len(ids)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        if V:
            tf = (
                batch["tfs"]
                .combine_chunks()
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(n, V)
                .astype(np.float64)
            )
        else:
            tf = np.zeros((n, 0), np.float64)
        vpos = {t: i for i, t in enumerate(vocab)}
        norm = k1 * (1.0 - b + b * dl / avgdl)
        out_q, out_s = [], []
        out_sel = []
        for name, toks in qt.items():
            cols = [vpos[t] for t in toks]
            w = np.array([idf_l[t] for t in toks])
            s = np.zeros(n)
            for c, wi in zip(cols, w):
                col = tf[:, c]
                s += wi * (col * (k1 + 1.0)) / (col + norm)
            s = np.round(s, round_to)
            order = np.lexsort((ids, -s))[:k]
            out_q.extend([name] * len(order))
            out_sel.extend(order.tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query": pa.array(out_q, pa.string()),
                id_column: batch[id_column].take(pa.array(out_sel, pa.int64())),
                "score": pa.array(out_s, pa.float64()),
                "part": pa.array(np.zeros(len(out_q), np.int64)),
            }
        )

    cands = narrow.map_batches(score_block, batch_format="pyarrow", batch_size=None)

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query": pa.array([], pa.string()),
                id_column: pa.array([], id_type),
                "score": pa.array([], pa.float64()),
                "rk": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "query" not in group.column_names:
            return empty
        q = np.array(group["query"].to_pylist(), dtype=object)
        ids = np.array(group[id_column].to_pylist(), dtype=object)
        s = group["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s, q))
        sq = q[order]
        newq = np.ones(len(sq), dtype=bool)
        newq[1:] = sq[1:] != sq[:-1]
        start = np.maximum.accumulate(np.where(newq, np.arange(len(sq)), 0))
        rk = np.arange(len(sq)) - start + 1
        keep = rk <= k
        sel = order[keep]
        return pa.table(
            {
                "query": group["query"].take(pa.array(sel)),
                id_column: group[id_column].take(pa.array(sel)),
                "score": group["score"].take(pa.array(sel)),
                "rk": pa.array(rk[keep].astype(np.int64)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        # per-query top-k is mergeable with the same (-score, id) tie-break,
        # so each tree level keeps <= |queries| * k candidate rows
        if group.num_rows == 0 or "query" not in group.column_names:
            return pa.table(
                {
                    "query": pa.array([], pa.string()),
                    id_column: pa.array([], id_type),
                    "score": pa.array([], pa.float64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        q = np.array(group["query"].to_pylist(), dtype=object)
        ids = np.array(group[id_column].to_pylist(), dtype=object)
        s = group["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s, q))
        sq = q[order]
        newq = np.ones(len(sq), dtype=bool)
        newq[1:] = sq[1:] != sq[:-1]
        start = np.maximum.accumulate(np.where(newq, np.arange(len(sq)), 0))
        rk = np.arange(len(sq)) - start + 1
        sel = pa.array(order[rk <= k])
        return pa.table(
            {
                "query": group["query"].take(sel),
                id_column: group[id_column].take(sel),
                "score": group["score"].take(sel),
                "part": pa.array(np.zeros(len(sel), np.int64)),
            }
        )

    from ..stages.exchange import tree_fold

    return tree_fold(cands, combine, fold)


def with_unigram_surprisal(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int = 16,
    round_to: int = 6,
    alias: str = "surprisal",
) -> ray.data.Dataset:
    """Corpus-unigram surprisal per document — the distribution-based
    quality score (a cheap stand-in for LM-perplexity filters): each doc
    gets ``-mean(ln P(token))`` under the corpus unigram distribution.
    Gibberish and boilerplate-free rare-token soup score high; repetitive
    boilerplate scores low.

    Fully distributed, no vocabulary broadcast: the same globally-unique
    (doc, token, tf) rows as TF-IDF exchange once by token hash — the
    in-partition tf sum IS the exact global token count — stamping each
    row's ``tf * ln(count/total)`` contribution; a doc-hash exchange sums
    contributions into ``(doc_id, n_tokens, surprisal)``. The corpus
    token total is the sum of the same tf partials (the counts dataset is
    materialized once — the exchange pins its blocks anyway — so the text
    is tokenized exactly once end to end)."""
    id_type = ds.schema().base_schema.field(id_column).type
    counts = ds.map_batches(
        lambda b: _term_counts(b, text_column, id_column, num_partitions, id_type),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    total = int(counts.sum("tf") or 0)
    empty_out = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            alias: pa.array([], pa.float64()),
        }
    )
    if total == 0:
        return ray.data.from_arrow(empty_out)

    def stamp_contrib(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "contrib": pa.array([], pa.float64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "token" not in group.column_names:
            return empty
        enc = group["token"].combine_chunks().dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ct = np.zeros(len(enc.dictionary), np.int64)
        tf = group["tf"].to_numpy(zero_copy_only=False)
        np.add.at(ct, inv, tf)
        contrib = tf.astype(np.float64) * np.log(
            ct[inv].astype(np.float64) / float(total)
        )
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": group["doc_id"].combine_chunks(),
                "tf": group["tf"].combine_chunks(),
                "contrib": pa.array(contrib),
                _PART: pa.array(_spart(ids, num_partitions)),
            }
        )

    stamped = hash_partition_exchange(
        counts, _PART, num_partitions, stamp_contrib
    )

    def per_doc(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty_out
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ids, return_inverse=True)
        dl = np.zeros(len(uniq), np.int64)
        np.add.at(dl, inv, group["tf"].to_numpy(zero_copy_only=False))
        cs = np.zeros(len(uniq), np.float64)
        np.add.at(cs, inv, group["contrib"].to_numpy(zero_copy_only=False))
        first = np.full(len(uniq), len(ids), np.int64)
        np.minimum.at(first, inv, np.arange(len(ids)))
        return pa.table(
            {
                "doc_id": group["doc_id"].take(pa.array(first)),
                "n_tokens": pa.array(dl),
                alias: pa.array(np.round(-cs / dl, round_to)),
            }
        )

    return hash_partition_exchange(stamped, _PART, num_partitions, per_doc)
