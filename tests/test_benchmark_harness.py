"""The real-benchmark harness (python -m text_dedup_ray.benchmark): skips
cleanly when no local dataset copy exists, and computes reference-shaped
metrics on a synthetic CORE/NEWS-shaped table with planted duplicates."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from text_dedup_ray.benchmark import (
    classify_prediction,
    clusters_to_predictions,
    evaluate_core,
    main,
    run_core,
    run_news,
)


def test_skips_without_data(capsys):
    assert main(["--dataset", "core", "--data-path", "/nope/nothing.parquet"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["skipped"] is True


def test_classify_matches_reference_rules():
    # benchmarks/utils.py:66-92: subset-TP, empty-prediction TN/FN
    assert classify_prediction(set(), set()) == "TN"
    assert classify_prediction({"a"}, set()) == "FN"
    assert classify_prediction({"a"}, {"a", "b"}) == "TP"  # subset rule
    assert classify_prediction({"a", "c"}, {"a", "b"}) == "FP"
    assert classify_prediction(set(), {"b"}) == "FP"


def test_clusters_to_predictions():
    parents = {0: 0, 1: 0, 2: 2}
    id_to_ext = {0: "x", 1: "y", 2: "z"}
    preds = clusters_to_predictions(parents, id_to_ext)
    assert preds == {"x": {"y"}, "y": {"x"}, "z": set()}


def _core_table() -> pa.Table:
    # 20 docs; 0<->1 and 2<->3 are labeled near-duplicates with near-identical
    # abstracts; the rest are unique
    import numpy as np

    rng = np.random.RandomState(7)
    vocab = [f"w{c}" for c in range(400)]
    titles, abstracts, core_ids, dups = [], [], [], []
    for i in range(20):
        core_ids.append(f"c{i}")
        if i in (0, 1):
            titles.append("A Study Of Dedup")
            abstracts.append("minhash signatures corpora study alpha beta gamma")
            dups.append([f"c{1 - i}"])
        elif i in (2, 3):
            titles.append("Another Paper Title")
            abstracts.append("suffix arrays dedup delta epsilon zeta eta theta")
            dups.append([f"c{5 - i}"])
        else:
            # genuinely distinct: disjoint-ish random word samples
            words = rng.choice(vocab, size=25, replace=False)
            titles.append(f"Unique Title {i}")
            abstracts.append(" ".join(words))
            dups.append([])
    return pa.table(
        {
            "core_id": pa.array(core_ids),
            "processed_title": pa.array(titles),
            "processed_abstract": pa.array(abstracts),
            "labelled_duplicates": pa.array(dups, pa.list_(pa.string())),
        }
    )


def test_core_harness_end_to_end(tmp_path):
    import ray.data

    p = str(tmp_path / "core.parquet")
    pq.write_table(_core_table(), p)
    ds = ray.data.read_parquet(p)
    out = run_core(ds, ["minhash"])
    m = out["minhash"]["metrics"]
    assert m["recall_duplicates"] == 1.0  # planted exact-ish pairs all found
    assert m["accuracy"] >= 0.9
    assert out["minhash"]["seconds"] > 0


def test_news_harness_end_to_end(tmp_path):
    import ray.data

    articles, clusters = [], []
    for i in range(12):
        if i < 4:  # one 4-member true cluster of near-identical articles
            articles.append("Breaking news: the quick brown fox jumped again today " + "x" * i)
            clusters.append(100)
        else:
            articles.append(f"entirely different report number {i} about {i * 13} things happening")
            clusters.append(i)
    t = pa.table({"article": pa.array(articles), "cluster": pa.array(clusters, pa.int64())})
    ds = ray.data.from_arrow(t)
    out = run_news(ds, ["minhash"])
    assert out["minhash"]["ari"] > 0.8
