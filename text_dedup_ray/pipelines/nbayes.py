"""Distributed multinomial Naive Bayes — the train-a-filter-then-score-the-
corpus pattern (CCNet / GPT-3-style quality and language classifiers) as two
Ray Data passes:

* :func:`naive_bayes_fit` — one pass of block-local (label, token, count)
  pre-aggregation, a token-hash exchange to global (token, label) counts,
  and a bounded model gather (vocab × labels rows — guarded by
  ``max_model_terms``; the corpus itself never reaches the driver).
* :func:`naive_bayes_predict` — the model is ``ray.put`` once and every
  scoring block does a vectorized vocab ``searchsorted`` + one
  ``np.add.at`` accumulation; zero-token docs fall back to the prior.

Laplace-smoothed multinomial NB (alpha additive, vocab-size normalized):
``score(d, l) = ln P(l) + sum_t tf(d,t) * ln((cnt(l,t)+a) / (tot(l)+a*V))``
with unseen-token default ``ln(a / (tot(l)+a*V))``. Prediction is the
argmax over scores ROUNDED to ``round_to`` decimals with ties broken by
label sort order — the same rounded ranking the DuckDB oracle computes, so
cross-engine libm ulp noise cannot flip a prediction."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import hash_partition_exchange
from .tfidf import _PART, _term_counts


@dataclass
class NaiveBayesModel:
    labels: list[str]  # sorted
    prior_log: np.ndarray  # (L,)
    vocab: np.ndarray  # sorted token strings, (V,)
    logprob: np.ndarray  # (V, L)
    default_log: np.ndarray  # (L,) unseen-token contribution
    alpha: float


def naive_bayes_fit(
    ds: ray.data.Dataset,
    text_column: str = "text",
    label_column: str = "lang",
    alpha: float = 1.0,
    num_partitions: int = 16,
    max_model_terms: int = 2_000_000,
) -> NaiveBayesModel:
    """Fit the classifier. ``max_model_terms`` bounds the driver-side model
    at vocab-size rows (NOT corpus-size); raise instead of silently
    gathering an unbounded vocabulary — hash-bucket features upstream if
    the corpus vocabulary is larger."""

    # ---- per-label doc counts (priors): tiny integer partials
    def prior_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"label": pa.array([], pa.string()), "nd": pa.array([], pa.int64())}
            )
        import pandas as pd

        codes, uniq = pd.factorize(
            batch[label_column].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "label": pa.array([str(u) for u in uniq], pa.string()),
                "nd": pa.array(np.bincount(codes).astype(np.int64)),
            }
        )

    priors_df = (
        ds.select_columns([label_column])
        .map_batches(prior_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    if len(priors_df) == 0:
        raise ValueError("naive_bayes_fit needs a non-empty dataset")
    doc_counts = priors_df.groupby("label")["nd"].sum()
    labels = sorted(doc_counts.index.tolist())
    n_docs = int(doc_counts.sum())

    # ---- (label, token) count partials: block-local pre-aggregation
    def count_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "label": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        # reuse the vectorized tfidf kernel: (row-idx, token, tf, part)
        spine = batch.append_column(
            "__row", pa.array(np.arange(batch.num_rows, dtype=np.int64))
        )
        tc = _term_counts(spine, text_column, "__row", num_partitions, pa.int64())
        if tc.num_rows == 0:
            return empty
        import pandas as pd

        row_idx = tc["doc_id"].to_numpy(zero_copy_only=False)
        lab = batch[label_column].to_numpy(zero_copy_only=False)[row_idx]
        df = pd.DataFrame(
            {
                "label": lab,
                "token": tc["token"].to_numpy(zero_copy_only=False),
                "cnt": tc["tf"].to_numpy(zero_copy_only=False),
                "part": tc[_PART].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby(["part", "label", "token"], sort=False)["cnt"].sum().reset_index()
        return pa.table(
            {
                "label": pa.array(agg["label"].astype(str), pa.string()),
                "token": pa.array(agg["token"].astype(str), pa.string()),
                "cnt": pa.array(agg["cnt"].to_numpy(np.int64)),
                "part": pa.array(agg["part"].to_numpy(np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "token" not in group.column_names:
            return pa.table(
                {
                    "label": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        import pandas as pd

        df = group.to_pandas().groupby(["label", "token"], sort=False)["cnt"].sum()
        df = df.reset_index()
        return pa.table(
            {
                "label": pa.array(df["label"], pa.string()),
                "token": pa.array(df["token"], pa.string()),
                "cnt": pa.array(df["cnt"].to_numpy(np.int64)),
            }
        )

    partials = ds.select_columns([text_column, label_column]).map_batches(
        count_partial, batch_format="pyarrow", batch_size=None
    )
    model_rows = hash_partition_exchange(partials, "part", num_partitions, fold)
    # bounded gather: vocab x labels rows, not corpus rows
    mdf = model_rows.to_pandas()
    if len(mdf) > max_model_terms:
        raise ValueError(
            f"model has {len(mdf)} (token,label) rows > max_model_terms="
            f"{max_model_terms}; hash-bucket features upstream"
        )

    vocab = np.array(sorted(mdf["token"].unique()), dtype=object) if len(mdf) else np.array([], object)
    V = len(vocab)
    L = len(labels)
    lab_idx = {l: i for i, l in enumerate(labels)}
    counts = np.zeros((V, L), np.int64)
    if len(mdf):
        vi = np.searchsorted(vocab, mdf["token"].to_numpy())
        li = np.fromiter((lab_idx[l] for l in mdf["label"]), np.int64, count=len(mdf))
        np.add.at(counts, (vi, li), mdf["cnt"].to_numpy(np.int64))
    tot = counts.sum(axis=0).astype(np.float64)
    denom = tot + alpha * V
    logprob = np.log((counts + alpha) / denom)
    default_log = np.log(alpha / denom)
    prior_log = np.log(
        np.array([doc_counts[l] for l in labels], np.float64) / n_docs
    )
    return NaiveBayesModel(
        labels=labels,
        prior_log=prior_log,
        vocab=vocab,
        logprob=logprob,
        default_log=default_log,
        alpha=alpha,
    )


def naive_bayes_predict(
    ds: ray.data.Dataset,
    model: NaiveBayesModel,
    text_column: str = "text",
    id_column: str = "doc_id",
    out_column: str = "pred_label",
    round_to: int = 6,
) -> ray.data.Dataset:
    """Score every row against the broadcast model and stamp the predicted
    label (argmax over ``round_to``-rounded scores, ties -> first label in
    sort order). Zero-token docs get the prior argmax."""
    model_ref = ray.put(model)
    id_type = ds.schema().base_schema.field(id_column).type

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_column: pa.array([], id_type),
                    out_column: pa.array([], pa.string()),
                }
            )
        m: NaiveBayesModel = (
            ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        )
        n = batch.num_rows
        scores = np.tile(m.prior_log, (n, 1))
        spine = batch.append_column(
            "__row", pa.array(np.arange(n, dtype=np.int64))
        )
        tc = _term_counts(spine, text_column, "__row", 1, pa.int64())
        if tc.num_rows:
            toks = tc["token"].to_numpy(zero_copy_only=False)
            rows = tc["doc_id"].to_numpy(zero_copy_only=False)
            tf = tc["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            vi = np.searchsorted(m.vocab, toks)
            vi_c = np.clip(vi, 0, max(len(m.vocab) - 1, 0))
            known = (
                (len(m.vocab) > 0)
                & (vi < len(m.vocab))
                & (m.vocab[vi_c] == toks)
            )
            contrib = np.where(
                known[:, None], m.logprob[vi_c], m.default_log[None, :]
            ) * tf[:, None]
            np.add.at(scores, rows, contrib)
        rounded = np.round(scores, round_to)
        pred = np.argmax(rounded, axis=1)  # first max == smallest label idx
        lab = np.array(m.labels, object)[pred]
        return pa.table(
            {
                id_column: batch[id_column].combine_chunks(),
                out_column: pa.array(lab.tolist(), pa.string()),
            }
        )

    return ds.select_columns([id_column, text_column]).map_batches(
        score, batch_format="pyarrow"
    )
