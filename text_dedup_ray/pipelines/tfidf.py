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
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha1(str(v).encode()).digest()[:8], "little")
            % num_partitions
            for v in vals
        ),
        np.int64,
        count=len(vals),
    )


def _term_counts(
    batch: pa.Table, text_column: str, id_column: str, num_partitions: int
) -> pa.Table:
    id_type = batch.schema.field(id_column).type if batch.num_rows else pa.int64()
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
    ids_out: list = []
    toks: list[str] = []
    tfs: list[int] = []
    ids = batch[id_column].to_pylist()
    for did, text in zip(ids, batch[text_column].to_pylist()):
        counts: dict[str, int] = {}
        for t in TOKEN_RE.findall(text.lower()):
            counts[t] = counts.get(t, 0) + 1
        ids_out.extend([did] * len(counts))
        toks.extend(counts.keys())
        tfs.extend(counts.values())
    if not toks:
        return empty
    return pa.table(
        {
            "doc_id": pa.array(ids_out, id_type),
            "token": pa.array(toks, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            _PART: pa.array(_spart(toks, num_partitions)),
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
    toks = np.array(group["token"].to_pylist(), dtype=object)
    uniq, inv, cnt = np.unique(toks, return_inverse=True, return_counts=True)
    df = cnt[inv].astype(np.int64)
    tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
    score = np.round(tf * np.log(float(n_docs) / df), round_to)
    ids = group["doc_id"].to_pylist()
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
    ids = np.array(group["doc_id"].to_pylist(), dtype=object)
    toks = np.array(group["token"].to_pylist(), dtype=object)
    score = group["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((toks, -score, ids))
    sids = ids[order]
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
    counts = ds.map_batches(
        lambda b: _term_counts(b, text_column, id_column, num_partitions),
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
