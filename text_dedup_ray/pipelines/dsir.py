"""DSIR-style importance-resampling corpus selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) scores every raw-corpus document by the
log-likelihood ratio of its hashed n-gram counts under a TARGET
distribution p versus the RAW distribution q, then keeps the
highest-weight documents.  This is the standard public recipe for
"give me more data that looks like my curated seed set" at pretraining
scale, and it composes with the dedup/quality funnel (curate.py).

Distributed shape (100 TB posture):

- Both distributions are **hashed** n-gram (unigram + bigram) count
  vectors of fixed size ``num_buckets`` — two single-pass folds whose
  partials are nonzero ``(bucket, count)`` pairs per block, never rows,
  never vocabulary. The dense vectors (B ints) live only on the driver.
- The per-bucket log-likelihood-ratio vector (B float64) is broadcast
  once via ``ray.put``; one stateless ``map_batches`` pass stamps each
  doc's score — payload text never shuffles, nothing wide happens.
- Selection is a global top-k (block-local prune then one tiny
  finalizer partition — only ``blocks x k`` rows move).

Gram identity is md5-prefix-64 mod ``num_buckets`` — the SAME function
the DuckDB oracle applies (``('0x' || substr(md5(g), 1, 16))::UBIGINT %
B``), so op and oracle bucket bit-identically; the only float work is
the llr sum, which both engines round to ``round_to`` before ranking
(the repo's rounded-ranking convention, see nbayes.py).

Tokenizer parity: lower + runs of ``[a-z0-9_]+`` — identical to the
tfidf/nbayes kernels and their oracles.

Reference parity note: the reference repo has no data-selection stage;
this extends its dedup suite toward a full curation pipeline (SURVEY
§2 "beyond-reference" operators), following the public DSIR method.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import tree_fold

_PART = "__dsir_part"


def _gram_occurrences(
    texts: pa.ChunkedArray | pa.Array, num_buckets: int, ngram_max: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, bucket) for every gram OCCURRENCE in the block.

    Tokens stream stays Arrow-side; md5 runs once per DISTINCT unigram /
    bigram in the block, never per occurrence (same distinct-only trick
    as tfidf._term_counts / sketch kernels).
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    splits = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z0-9_]+")
    flat = pc.list_flatten(splits)
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    if len(flat) == 0 or not pc.any(nonempty).as_py():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
    keep = nonempty.to_numpy(zero_copy_only=False)
    doc_idx = parents[keep].astype(np.int64)
    enc = flat.filter(nonempty).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pylist()

    def bucket_of(g: str) -> int:
        return int.from_bytes(
            hashlib.md5(g.encode("utf-8")).digest()[:8], "big"
        ) % num_buckets

    ubuck = np.fromiter(
        (bucket_of(g) for g in uniq), np.int64, count=len(uniq)
    )
    out_doc = [doc_idx]
    out_buck = [ubuck[codes]]
    if ngram_max >= 2 and len(codes) >= 2:
        same = doc_idx[1:] == doc_idx[:-1]
        if same.any():
            a = codes[:-1][same]
            b = codes[1:][same]
            pair_key = a * np.int64(len(uniq)) + b
            upair, inv = np.unique(pair_key, return_inverse=True)
            pa_idx = (upair // len(uniq)).astype(np.int64)
            pb_idx = (upair % len(uniq)).astype(np.int64)
            pbuck = np.fromiter(
                (
                    bucket_of(f"{uniq[i]} {uniq[j]}")
                    for i, j in zip(pa_idx, pb_idx)
                ),
                np.int64,
                count=len(upair),
            )
            out_doc.append(doc_idx[1:][same])
            out_buck.append(pbuck[inv])
    return np.concatenate(out_doc), np.concatenate(out_buck)


def hashed_gram_counts(
    ds: ray.data.Dataset,
    text_column: str = "text",
    num_buckets: int = 4096,
    ngram_max: int = 2,
) -> np.ndarray:
    """Dense hashed-gram count vector (B int64) for a corpus.

    One streaming pass; each block emits only its NONZERO (bucket,
    count) pairs, one single-partition fold densifies — the driver ever
    holds B integers, not rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or text_column not in batch.column_names:
            return empty
        _, buck = _gram_occurrences(batch[text_column], num_buckets, ngram_max)
        if len(buck) == 0:
            return empty
        cnt = np.bincount(buck, minlength=num_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64)),
                "c": pa.array(cnt[nz].astype(np.int64)),
                _PART: pa.array(np.zeros(len(nz), np.int64)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        # associative sparse merge: sum c per bucket, stay sparse — each
        # tree level emits ONE partial row-set of the same (b, c) schema
        if group.num_rows == 0 or "b" not in group.column_names:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    _PART: pa.array([], pa.int64()),
                }
            )
        b = group["b"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        cc = np.bincount(inv, weights=c).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(ub.astype(np.int64)),
                "c": pa.array(cc),
                _PART: pa.array(np.zeros(len(ub), np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "b" not in group.column_names:
            return pa.table({"counts": pa.array([], pa.list_(pa.int64()))})
        dense = np.zeros(num_buckets, np.int64)
        np.add.at(
            dense,
            group["b"].to_numpy(zero_copy_only=False),
            group["c"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"counts": pa.array([dense.tolist()])})

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    rows = tree_fold(pre, combine, fold).take_all()
    if not rows:
        return np.zeros(num_buckets, np.int64)
    return np.asarray(rows[0]["counts"], dtype=np.int64)


def hashed_gram_counts_pair(
    ds: ray.data.Dataset,
    mask_column: str,
    text_column: str = "text",
    num_buckets: int = 4096,
    ngram_max: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """(raw_counts, target_counts) in ONE corpus pass, for the common
    case where the target cohort is a boolean-masked subset of the raw
    corpus — halves the scan count vs two :func:`hashed_gram_counts`
    calls (at 100 TB, one fewer full read of the corpus)."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "ct": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or text_column not in batch.column_names:
            return empty
        doc_idx, buck = _gram_occurrences(
            batch[text_column], num_buckets, ngram_max
        )
        if len(buck) == 0:
            return empty
        mask = (
            batch[mask_column]
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        cnt = np.bincount(buck, minlength=num_buckets)
        tgt_occ = buck[mask[doc_idx]]
        ct = np.bincount(tgt_occ, minlength=num_buckets)
        nz = np.flatnonzero(cnt)  # ct nonzero implies cnt nonzero
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64)),
                "c": pa.array(cnt[nz].astype(np.int64)),
                "ct": pa.array(ct[nz].astype(np.int64)),
                _PART: pa.array(np.zeros(len(nz), np.int64)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        # associative sparse (b, c, ct) merge — same schema out as in
        if group.num_rows == 0 or "b" not in group.column_names:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "ct": pa.array([], pa.int64()),
                    _PART: pa.array([], pa.int64()),
                }
            )
        b = group["b"].to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        cc = np.bincount(
            inv, weights=group["c"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cct = np.bincount(
            inv, weights=group["ct"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(ub.astype(np.int64)),
                "c": pa.array(cc),
                "ct": pa.array(cct),
                _PART: pa.array(np.zeros(len(ub), np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "b" not in group.column_names:
            return pa.table(
                {
                    "counts": pa.array([], pa.list_(pa.int64())),
                    "tcounts": pa.array([], pa.list_(pa.int64())),
                }
            )
        b = group["b"].to_numpy(zero_copy_only=False)
        dense = np.zeros(num_buckets, np.int64)
        tdense = np.zeros(num_buckets, np.int64)
        np.add.at(dense, b, group["c"].to_numpy(zero_copy_only=False))
        np.add.at(tdense, b, group["ct"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "counts": pa.array([dense.tolist()]),
                "tcounts": pa.array([tdense.tolist()]),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    rows = tree_fold(pre, combine, fold).take_all()
    if not rows:
        z = np.zeros(num_buckets, np.int64)
        return z, z.copy()
    return (
        np.asarray(rows[0]["counts"], dtype=np.int64),
        np.asarray(rows[0]["tcounts"], dtype=np.int64),
    )


def dsir_llr(
    target_counts: np.ndarray,
    raw_counts: np.ndarray,
    smoothing: float = 1.0,
) -> np.ndarray:
    """Per-bucket log((p_b+a)/(P+aB)) - log((q_b+a)/(Q+aB)), float64.

    Expression shape is mirrored verbatim by the SQL oracle (divide then
    ln, never ln-difference re-association) so both engines walk the
    same float path up to summation order.
    """
    p = target_counts.astype(np.float64)
    q = raw_counts.astype(np.float64)
    nb = float(len(p))
    a = float(smoothing)
    tp = float(int(target_counts.sum()))
    tq = float(int(raw_counts.sum()))
    return np.log((p + a) / (tp + a * nb)) - np.log((q + a) / (tq + a * nb))


def dsir_weights(
    ds: ray.data.Dataset,
    target_ds: ray.data.Dataset | None,
    text_column: str = "text",
    num_buckets: int = 4096,
    ngram_max: int = 2,
    smoothing: float = 1.0,
    round_to: int = 6,
    score_alias: str = "dsir_score",
    target_mask_column: str | None = None,
) -> ray.data.Dataset:
    """Stamp every raw-corpus row with its DSIR importance log-weight.

    The target distribution comes from ``target_ds`` (any dataset, two
    count passes) OR — when the target is a subset of ``ds`` — from a
    boolean ``target_mask_column`` on ``ds`` itself (ONE count pass for
    both distributions; pass ``target_ds=None``). Docs with zero grams
    score exactly 0.0 (the empty product), matching the oracle's LEFT
    JOIN + coalesce semantics.
    """
    if target_mask_column is not None:
        raw_counts, tgt_counts = hashed_gram_counts_pair(
            ds, target_mask_column, text_column, num_buckets, ngram_max
        )
    elif target_ds is None:
        raise ValueError("need target_ds or target_mask_column")
    else:
        raw_counts = hashed_gram_counts(
            ds, text_column, num_buckets, ngram_max
        )
        tgt_counts = hashed_gram_counts(
            target_ds, text_column, num_buckets, ngram_max
        )
    llr_ref = ray.put(dsir_llr(tgt_counts, raw_counts, smoothing))

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                score_alias, pa.array([], pa.float64())
            )
        llr = ray.get(llr_ref)
        doc_idx, buck = _gram_occurrences(
            batch[text_column], num_buckets, ngram_max
        )
        score = np.zeros(batch.num_rows, np.float64)
        if len(buck):
            score = np.bincount(
                doc_idx, weights=llr[buck], minlength=batch.num_rows
            )
        # + 0.0 turns any -0.0 into +0.0 (IEEE), matching the oracle's
        # identical normalization — hashers distinguish the two zeros
        return batch.append_column(
            score_alias, pa.array(np.round(score, round_to) + 0.0)
        )

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def dsir_select(
    ds: ray.data.Dataset,
    target_ds: ray.data.Dataset | None,
    k: int,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_buckets: int = 4096,
    ngram_max: int = 2,
    smoothing: float = 1.0,
    round_to: int = 6,
    score_alias: str = "dsir_score",
    target_mask_column: str | None = None,
) -> ray.data.Dataset:
    """Global top-``k`` raw docs by (rounded DSIR weight DESC, id ASC).

    Deterministic top-k rather than Gumbel resampling — the paper's
    sampled variant is a seeded perturbation of the same weights; a
    fixed ranking is what a reproducible curation funnel wants, and
    ties can't flap because the id breaks them.
    """
    from .agg import grouped_top_k

    scored = dsir_weights(
        ds,
        target_ds,
        text_column=text_column,
        num_buckets=num_buckets,
        ngram_max=ngram_max,
        smoothing=smoothing,
        round_to=round_to,
        score_alias=score_alias,
        target_mask_column=target_mask_column,
    )

    def const_key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__dsir_all", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    keyed = scored.map_batches(
        const_key, batch_format="pyarrow", batch_size=None
    )
    top = grouped_top_k(
        keyed,
        "__dsir_all",
        [(score_alias, "descending"), (id_column, "ascending")],
        k,
        rank_alias=None,
        num_partitions=1,
    )
    return top.drop_columns(["__dsir_all"])
