"""pipelines/dsir: hashed-ngram importance-resampling selection — kernel
parity vs a straight-line reference, target-affinity sanity, edge docs."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.dsir import (
    _gram_occurrences,
    dsir_llr,
    dsir_select,
    dsir_weights,
    hashed_gram_counts,
)

TOKEN_RE = re.compile(r"[a-z0-9_]+")


def _buckets_ref(text: str, nb: int, ngram_max: int) -> list[int]:
    toks = TOKEN_RE.findall(text.lower())
    grams = list(toks)
    if ngram_max >= 2:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") % nb
        for g in grams
    ]


def test_gram_occurrences_matches_reference_multiset():
    texts = [
        "The quick brown fox; the QUICK fox!",
        "",
        "   ...   ",
        "one",
        "alpha beta alpha beta gamma",
        "Ünïcode stays out: café 123_x",
    ]
    doc_idx, buck = _gram_occurrences(pa.array(texts), 64, 2)
    got = {}
    for d, b in zip(doc_idx, buck):
        got.setdefault(int(d), []).append(int(b))
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == sorted(_buckets_ref(t, 64, 2)), i


def test_gram_occurrences_unigram_only():
    texts = ["a b c", "d d"]
    _, buck = _gram_occurrences(pa.array(texts), 256, 1)
    ref = _buckets_ref(texts[0], 256, 1) + _buckets_ref(texts[1], 256, 1)
    assert sorted(int(b) for b in buck) == sorted(ref)


def test_counts_fold_and_llr(ray_session):
    texts = ["apple banana", "banana cherry", "apple apple"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(3)
    counts = hashed_gram_counts(ds, "text", num_buckets=128, ngram_max=1)
    ref = np.zeros(128, np.int64)
    for t in texts:
        for b in _buckets_ref(t, 128, 1):
            ref[b] += 1
    assert (counts == ref).all()
    llr = dsir_llr(ref, ref, smoothing=1.0)
    assert np.allclose(llr, 0.0)  # identical distributions => zero weight


def test_select_prefers_target_lookalikes(ray_session):
    rng = np.random.default_rng(9)
    va = ["apple", "banana", "cherry", "plum", "grape"]
    vb = ["table", "chair", "lamp", "sofa", "desk"]
    rows = []
    for i in range(200):
        fruity = i % 2 == 0
        voc = va if fruity else vb
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(voc, 12)),
                "is_fruit": fruity,
            }
        )
    tbl = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows]),
            "text": pa.array([r["text"] for r in rows]),
            "is_fruit": pa.array([r["is_fruit"] for r in rows]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)

    def tgt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # target = fruit docs with doc_id < 50 (a seed subset)
        return t.filter(
            pc.and_(pc.equal(t["is_fruit"], True), pc.less(t["doc_id"], 50))
        )

    target = ds.map_batches(tgt, batch_format="pyarrow")
    top = dsir_select(ds, target, k=40, num_buckets=512).to_pandas()
    assert len(top) == 40
    assert top["is_fruit"].all()  # every selected doc is fruit-like
    # scores sorted desc, id-tiebreak asc
    s = top["dsir_score"].to_numpy()
    assert (np.diff(s) <= 0).all()


def test_empty_and_token_free_docs_score_zero(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["", "!!! ...", "real words here"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    scored = dsir_weights(ds, ds, text_column="text").to_pandas()
    scored = scored.set_index("doc_id").sort_index()
    assert scored.loc[0, "dsir_score"] == 0.0
    assert scored.loc[1, "dsir_score"] == 0.0
    # +0.0 normalization: never a negative zero
    assert not np.signbit(scored["dsir_score"].to_numpy()).any() or (
        scored["dsir_score"].to_numpy()[np.signbit(scored["dsir_score"])] < 0
    ).all()


def test_mask_path_equals_two_pass(ray_session):
    import pyarrow.compute as pc

    texts = [f"doc {i} alpha beta" if i % 3 else f"target gamma {i}" for i in range(60)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts),
            "is_t": pa.array([i % 3 == 0 for i in range(60)]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    target = ds.map_batches(
        lambda t: t.filter(pc.equal(t["is_t"], True)), batch_format="pyarrow"
    )
    two = (
        dsir_weights(ds, target, num_buckets=256)
        .to_pandas()
        .set_index("doc_id")["dsir_score"]
        .sort_index()
    )
    one = (
        dsir_weights(ds, None, num_buckets=256, target_mask_column="is_t")
        .to_pandas()
        .set_index("doc_id")["dsir_score"]
        .sort_index()
    )
    assert (two == one).all()
