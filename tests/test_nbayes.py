"""pipelines/nbayes: multinomial NB fit/predict vs a hand-rolled
reference, plus the zero-token / unseen-token / guard edges."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.nbayes import naive_bayes_fit, naive_bayes_predict


def _fit_ref(docs, labels, alpha=1.0):
    from collections import Counter, defaultdict

    cnt = defaultdict(Counter)
    nd = Counter(labels)
    vocab = set()
    for t, l in zip(docs, labels):
        toks = [w for w in t.lower().split() if w]
        cnt[l].update(toks)
        vocab.update(toks)
    V = len(vocab)
    tots = {l: sum(c.values()) for l, c in cnt.items()}
    labs = sorted(nd)

    def score(text):
        toks = [w for w in text.lower().split() if w]
        out = {}
        for l in labs:
            s = math.log(nd[l] / len(docs))
            for w in toks:
                c = cnt[l][w] if w in vocab else None
                if c is None:
                    s += math.log(alpha / (tots[l] + alpha * V))
                else:
                    s += math.log((c + alpha) / (tots[l] + alpha * V))
            out[l] = round(s, 6)
        scores = [out[l] for l in labs]
        return labs[scores.index(max(scores))]  # first max == smallest label

    return score


def test_matches_reference_and_recovers_labels():
    rng = np.random.default_rng(5)
    va = ["apple", "banana", "cherry", "plum"]
    vb = ["table", "chair", "lamp", "sofa"]
    docs, labels = [], []
    for _ in range(300):
        if rng.random() < 0.5:
            words = list(rng.choice(va, 8)) + list(rng.choice(vb, 2))
            labels.append("fruit")
        else:
            words = list(rng.choice(vb, 8)) + list(rng.choice(va, 2))
            labels.append("furniture")
        docs.append(" ".join(words))
    t = pa.table({"doc_id": np.arange(300), "text": docs, "lang": labels})
    ds = ray.data.from_arrow(t).repartition(5)
    model = naive_bayes_fit(ds, label_column="lang")
    got = (
        naive_bayes_predict(ds, model)
        .to_pandas()
        .sort_values("doc_id")["pred_label"]
        .tolist()
    )
    ref = _fit_ref(docs, labels)
    assert got == [ref(d) for d in docs]
    # the planted signal is strong: the classifier recovers >95% of labels
    acc = np.mean([g == l for g, l in zip(got, labels)])
    assert acc > 0.95


def test_zero_token_and_unseen_token_docs():
    train = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["x x x", "x x y", "z z z", "z w"],
            "lang": ["a", "a", "b", "b"],
        }
    )
    model = naive_bayes_fit(ray.data.from_arrow(train), label_column="lang")
    test = pa.table(
        {
            "doc_id": [10, 11, 12],
            "text": ["", "???", "qqq qqq"],  # zero tokens / zero tokens / unseen
        }
    )
    out = (
        naive_bayes_predict(ray.data.from_arrow(test), model)
        .to_pandas()
        .sort_values("doc_id")["pred_label"]
        .tolist()
    )
    # priors are equal -> zero-token docs tie -> first label 'a';
    # the unseen-token default ln(a/(tot+aV)) favors the label with the
    # SMALLER token total: tot_a=6, tot_b=5, V=4 -> ln(1/9) > ln(1/10) -> 'b'
    assert out == ["a", "a", "b"]


def test_empty_fit_raises():
    t = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="non-empty"):
        naive_bayes_fit(ray.data.from_arrow(t))


def test_model_size_guard():
    t = pa.table(
        {
            "doc_id": [0, 1],
            "text": ["a b c d e f g h", "i j k l m n o p"],
            "lang": ["x", "y"],
        }
    )
    with pytest.raises(ValueError, match="max_model_terms"):
        naive_bayes_fit(ray.data.from_arrow(t), max_model_terms=3)
