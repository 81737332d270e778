"""pipelines/curate.curate_corpus: funnel monotonicity, metrics, and the
keep-longest policy actually changing the survivor vs min-id dedup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.curate import curate_corpus

CFG = MinHashConfig(num_perm=32, bands=8, rows=4, ngram_size=2, hash_func="sha1")


def _corpus():
    rng = np.random.default_rng(3)
    vocab = ["the", "of", "and", "a", "stream", "batch", "window", "merge",
             "sort", "filter", "table", "join", "query", "vector"]
    docs, ids = [], []
    base = " ".join(rng.choice(vocab, 60))
    for i in range(200):
        ids.append(i)
        if i % 10 == 0:
            docs.append(base)  # exact dups of one another
        elif i % 10 == 1:
            # near-dup of base, LONGER -> keep-best should prefer it
            docs.append(base + " extra tail words of the stream")
        else:
            docs.append(" ".join(rng.choice(vocab, int(rng.integers(40, 80)))))
    return pa.table({"doc_id": ids, "text": docs})


def test_funnel_metrics_and_keep_longest():
    ds = ray.data.from_arrow(_corpus()).repartition(4)
    res = curate_corpus(
        ds,
        minhash_cfg=CFG,
        gopher_kw=dict(min_words=30),
        budget=5_000,
        capacity=256,
        collect_metrics=True,
    )
    m = res.metrics
    assert m["input_rows"] == 200
    # 20 exact copies of base collapse to 1, and the 20 identical long
    # variants collapse to 1 as well: 200 - 19 - 19
    assert m["exact_survivors"] == 162
    # the near-dup family (base + longer variants) collapses further
    assert m["near_dup_survivors"] < m["exact_survivors"]
    assert m["gopher_survivors"] <= m["near_dup_survivors"]
    assert m["selected_docs"] <= m["gopher_survivors"]
    assert m["selected_tokens"] <= 5_000

    plan = res.plan.to_pandas().sort_values("doc_id")
    assert (plan["n_tokens"] >= 30).all()
    # packing offsets are the exclusive prefix sum in doc_id order
    assert plan["offset"].tolist() == (
        plan["n_tokens"].cumsum().shift(fill_value=0)[:-1].tolist()
        + [int(plan["n_tokens"].iloc[:-1].sum())]
    )
    # keep-longest: the surviving member of the base family is a LONG variant
    fam = plan[plan["doc_id"] % 10 <= 1]
    if len(fam):
        assert (fam["doc_id"] % 10 == 1).all()


def test_empty_corpus():
    t = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    res = curate_corpus(ray.data.from_arrow(t), minhash_cfg=CFG, budget=100)
    assert res.plan.count() == 0
