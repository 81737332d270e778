"""Real-labeled-dataset benchmark harness (reference parity:
``benchmarks/run_benchmark.py:112-134`` + ``benchmark_core.py`` /
``benchmark_news.py``).

The reference pulls CORE (``pinecone/core-2020-05-10-deduplication``) and
NEWS-COPY (``chenghao/NEWS-COPY-eval``) from the HF hub. This sandbox has no
network, so the harness consumes a LOCAL copy (parquet file/dir or an HF
``save_to_disk`` dir) and SKIPS with a clear message when none is present —
wire-complete so it runs wherever the data exists:

    python -m text_dedup_ray.benchmark --dataset core \
        --data-path /data/core.parquet --algorithms minhash,simhash

Expected columns:
- core:  core_id, processed_title, processed_abstract, labelled_duplicates
  (text = lower(title + " " + abstract), run_benchmark.py:43)
- news:  article, cluster (text = news_copy_preprocessing(article),
  run_benchmark.py:85)

Metrics mirror the reference: per-doc duplicate-set classification
(TP/FP/TN/FN with subset-TP semantics, benchmarks/utils.py:66-92), macro
precision + exact-match accuracy (benchmark_core.py:52-115), and ARI for
NEWS (benchmark_news.py:40-57, via functions/evaluation.adjusted_rand_index).
Published reference numbers to compare against are in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

# CORE benchmark configs (configs/benchmark_core_minhash.toml:11-21 and
# siblings); hash_func is sha1 because the xxhash wheel is absent here.
CORE_MINHASH = dict(num_perm=200, ngram_size=2, bands=50, rows=4, threshold=0.5)
CORE_SIMHASH = dict(f=64, bit_diff=7, num_bucket=8, ngram_size=1)
NEWS_MINHASH = dict(num_perm=256, ngram_size=2, bands=None, rows=None, threshold=0.45)
NEWS_SIMHASH = dict(
    f=64, bit_diff=12, num_bucket=13, ngram_size=1,
    check_false_positive=True, jaccard_threshold=0.45,
)


def _load_local(path: str):
    """Local dataset copy -> ray Dataset (parquet file/dir or HF dir)."""
    from .sources.io import read_hf_dataset_dir, read_table

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "state.json")):
        return read_hf_dataset_dir(path)
    return read_table(path, fmt="parquet")


def classify_prediction(duplicates: set, predictions: set) -> str:
    """TP/FP/TN/FN with the reference's subset-TP rule
    (benchmarks/utils.py:66-92)."""
    if not predictions:
        return "TN" if not duplicates else "FN"
    if duplicates and duplicates.issubset(predictions):
        return "TP"
    return "FP"


def clusters_to_predictions(
    cluster_mapping: dict[int, int], id_to_ext: dict[int, str]
) -> dict[str, set[str]]:
    """{row_id: cluster} -> {ext_id: set(duplicate ext_ids)}
    (benchmarks/utils.py:95-130)."""
    cluster_to_docs: dict[int, set[str]] = defaultdict(set)
    for doc_idx, cluster_id in cluster_mapping.items():
        ext = id_to_ext.get(doc_idx)
        if ext:
            cluster_to_docs[cluster_id].add(ext)
    predictions: dict[str, set[str]] = {}
    for doc_idx, cluster_id in cluster_mapping.items():
        ext = id_to_ext.get(doc_idx)
        if ext:
            predictions[ext] = cluster_to_docs[cluster_id] - {ext}
    return predictions


def evaluate_core(
    labels: dict[str, set[str]], predictions: dict[str, set[str]]
) -> dict:
    """Macro precision + accuracy over per-doc duplicate sets
    (benchmark_core.py:52-115; the reference's 'macro_f1' key is macro
    precision — kept for comparability)."""
    counts: dict[str, int] = defaultdict(int)
    exact = 0
    for doc_id, gt in labels.items():
        pred = predictions.get(doc_id, set())
        counts[classify_prediction(gt, pred)] += 1
        exact += gt == pred
    tp, tn, fp, fn = counts["TP"], counts["TN"], counts["FP"], counts["FN"]
    dup_p = tp / (tp + fp) if tp + fp else 0.0
    dup_r = tp / (tp + fn) if tp + fn else 0.0
    non_p = tn / (tn + fn) if tn + fn else 0.0
    non_r = tn / (tn + fp) if tn + fp else 0.0
    return {
        "precision_duplicates": dup_p,
        "recall_duplicates": dup_r,
        "precision_non_duplicates": non_p,
        "recall_non_duplicates": non_r,
        "macro_f1": (dup_p + non_p) / 2,
        "accuracy": exact / max(len(labels), 1),
        "class_distribution": dict(counts),
    }


def _parents_as_dict(parents) -> dict[int, int]:
    if isinstance(parents, dict):
        return parents
    tbl = parents.to_pandas()
    return dict(zip(tbl["row_id"].astype(int), tbl["cluster_id"].astype(int)))


def run_core(ds, algorithms: list[str]) -> dict:
    import pyarrow as pa

    from .functions.minhash import MinHashConfig
    from .functions.simhash import SimHashConfig
    from .pipelines.minhash import minhash_dedup
    from .pipelines.simhash import simhash_dedup
    from .pipelines.textops import concat_text_columns
    from .sources.io import stamp_row_ids_from_key

    def add_idx(t: pa.Table) -> pa.Table:
        return t  # core_id is unique; used via stamp below

    prepared = concat_text_columns(
        ds, ["processed_title", "processed_abstract"], out_column="text", lowercase=True
    )
    # ground truth (benchmark_core.py:27-50): row ids are dense positions in
    # file order — stamp them deterministically from row position
    from .sources.io import ROW_ID

    local = prepared.to_pandas()
    local[ROW_ID] = range(len(local))
    id_to_core = dict(zip(local[ROW_ID], local["core_id"].astype(str)))
    labels = {
        str(c): set(d) if d is not None and len(d) else set()
        for c, d in zip(local["core_id"].astype(str), local["labelled_duplicates"])
    }
    import ray.data

    ds_idx = ray.data.from_pandas(local[[ROW_ID, "text"]])

    results = {}
    if "minhash" in algorithms:
        t0 = time.perf_counter()
        res = minhash_dedup(
            ds_idx, text_column="text",
            cfg=MinHashConfig(hash_func="sha1", **CORE_MINHASH),
        )
        parents = _parents_as_dict(res.parents)
        elapsed = time.perf_counter() - t0
        preds = clusters_to_predictions(parents, id_to_core)
        results["minhash"] = {"metrics": evaluate_core(labels, preds), "seconds": elapsed}
    if "simhash" in algorithms:
        t0 = time.perf_counter()
        res = simhash_dedup(
            ds_idx, text_column="text",
            cfg=SimHashConfig(hash_func="sha1", **CORE_SIMHASH),
        )
        parents = _parents_as_dict(res.parents)
        elapsed = time.perf_counter() - t0
        preds = clusters_to_predictions(parents, id_to_core)
        results["simhash"] = {"metrics": evaluate_core(labels, preds), "seconds": elapsed}
    return results


def run_news(ds, algorithms: list[str]) -> dict:
    import ray.data

    from .functions.evaluation import adjusted_rand_index
    from .functions.minhash import MinHashConfig
    from .functions.preprocess import news_copy_preprocessing
    from .functions.simhash import SimHashConfig
    from .pipelines.minhash import minhash_dedup
    from .pipelines.simhash import simhash_dedup
    from .sources.io import ROW_ID

    local = ds.to_pandas()
    local["text"] = [news_copy_preprocessing(a) for a in local["article"]]
    local[ROW_ID] = range(len(local))
    ground_truth = list(local["cluster"])
    ds_idx = ray.data.from_pandas(local[[ROW_ID, "text"]])

    def ari_for(parents: dict[int, int]) -> float:
        pred = [parents.get(i, i) for i in range(len(ground_truth))]
        return adjusted_rand_index(ground_truth, pred)

    results = {}
    if "minhash" in algorithms:
        t0 = time.perf_counter()
        res = minhash_dedup(
            ds_idx, text_column="text",
            cfg=MinHashConfig(hash_func="sha1", **NEWS_MINHASH),
        )
        results["minhash"] = {
            "ari": ari_for(_parents_as_dict(res.parents)),
            "seconds": time.perf_counter() - t0,
        }
    if "simhash" in algorithms:
        t0 = time.perf_counter()
        res = simhash_dedup(
            ds_idx, text_column="text",
            cfg=SimHashConfig(hash_func="sha1", **NEWS_SIMHASH),
        )
        results["simhash"] = {
            "ari": ari_for(_parents_as_dict(res.parents)),
            "seconds": time.perf_counter() - t0,
        }
    return results


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m text_dedup_ray.benchmark")
    ap.add_argument("--dataset", choices=["core", "news"], required=True)
    ap.add_argument("--data-path", default=None,
                    help="local copy (parquet file/dir or HF save_to_disk dir)")
    ap.add_argument("--algorithms", default="minhash,simhash")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args(argv)

    if not args.data_path or not os.path.exists(args.data_path):
        print(
            json.dumps(
                {
                    "skipped": True,
                    "reason": f"no local copy of {args.dataset} at "
                    f"{args.data_path!r} (datasets are not vendored; pass "
                    "--data-path where a copy exists)",
                }
            )
        )
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.num_cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    try:
        ds = _load_local(args.data_path)
        algos = args.algorithms.split(",")
        out = run_core(ds, algos) if args.dataset == "core" else run_news(ds, algos)
        print(json.dumps({"dataset": args.dataset, "results": out}, default=str))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
