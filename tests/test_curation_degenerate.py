"""Degenerate-input probes for the round-4 curation ops (the verify-skill
probe set applied to the new surface): all-identical corpus, unicode +
punctuation-only text, single-row inputs."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.curate import curate_corpus
from text_dedup_ray.pipelines.select import keep_best_in_cluster, select_token_budget
from text_dedup_ray.pipelines.textops import with_gopher_rules, with_scrubbed

CFG = MinHashConfig(num_perm=32, bands=8, rows=4, ngram_size=2, hash_func="sha1")


def test_all_identical_corpus_curates_to_one_doc():
    text = "the same long document body repeated verbatim with many words " * 3
    t = pa.table({"doc_id": list(range(64)), "text": [text] * 64})
    res = curate_corpus(
        ray.data.from_arrow(t).repartition(4),
        minhash_cfg=CFG,
        gopher_kw=dict(min_words=5, min_stopword_hits=0),
        budget=10_000,
        collect_metrics=True,
    )
    assert res.metrics["exact_survivors"] == 1
    plan = res.plan.to_pandas()
    assert len(plan) == 1 and plan["offset"].iloc[0] == 0
    assert plan["doc_id"].iloc[0] == 0  # min-id exact winner


def test_unicode_and_punctuation_only_docs():
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["héllo wörld ünïcode tëxt hére", "!!! ??? ... ###", "日本語のテキスト"],
        }
    )
    g = (
        with_gopher_rules(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # ASCII word-char counting: punctuation-only and CJK docs count 0 words
    assert g["n_words"][1] == 0 and g["n_words"][2] == 0
    assert not g["gopher_pass"].any()  # none reach 50 ASCII words

    s = (
        with_scrubbed(ray.data.from_arrow(t), "text", r"[!?#.]+", "<P>")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert s["scrubbed"][1] == "<P> <P> <P> <P>"
    assert s["scrubbed"][2] == "日本語のテキスト"  # untouched, still valid


def test_single_row_inputs():
    one = pa.table({"doc_id": [7], "cluster": [7], "score": [1.0]})
    kb = keep_best_in_cluster(ray.data.from_arrow(one), "cluster", "score", "doc_id")
    assert kb.to_pandas()["doc_id"].tolist() == [7]
    sel = select_token_budget(
        ray.data.from_arrow(pa.table({"id": [3], "tok": [10], "score": [1]})),
        "id", "tok", "score", budget=10,
    )
    assert sel.to_pandas()["id"].tolist() == [3]
