"""Evaluation-metric tests (math mirrored from the reference benchmark
helpers) + end-to-end quality grading of the pipelines vs planted truth."""

from __future__ import annotations

import pytest

from text_dedup_ray.functions.evaluation import (
    adjusted_rand_index,
    clusters_to_pairs,
    dup_pair_recall,
    pair_metrics,
)


class TestPairMath:
    def test_clusters_to_pairs(self):
        assert clusters_to_pairs({2: 1, 3: 1}) == {(1, 2), (1, 3), (2, 3)}
        assert clusters_to_pairs({}) == set()

    def test_pair_metrics(self):
        pred = {(1, 2), (3, 4)}
        truth = {(1, 2), (5, 6)}
        m = pair_metrics(pred, truth)
        assert m["precision"] == 0.5 and m["recall"] == 0.5
        assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1

    def test_perfect(self):
        m = pair_metrics(set(), set())
        assert m["precision"] == 1.0 and m["recall"] == 1.0


class TestARI:
    def test_identical(self):
        assert adjusted_rand_index([0, 0, 1, 1], [5, 5, 9, 9]) == 1.0

    def test_independent(self):
        # alternating vs half-split: low ARI
        a = [0, 1] * 10
        b = [0] * 10 + [1] * 10
        assert abs(adjusted_rand_index(a, b)) < 0.2

    def test_known_value(self):
        # classic example: ARI symmetric & bounded
        a = [0, 0, 1, 1, 2, 2]
        b = [0, 0, 0, 1, 1, 1]
        v1 = adjusted_rand_index(a, b)
        v2 = adjusted_rand_index(b, a)
        assert v1 == pytest.approx(v2)
        assert -1.0 <= v1 <= 1.0

    def test_length_mismatch(self):
        with pytest.raises(ValueError):
            adjusted_rand_index([1], [1, 2])


class TestQualityVsPlantedTruth:
    def test_minhash_recall_on_planted_corpus(self):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.data.gen import generate_corpus
        from text_dedup_ray.functions.minhash import MinHashConfig
        from text_dedup_ray.pipelines.minhash import minhash_dedup

        docs, truth = generate_corpus(800, seed=21)
        table = pa.table(
            {"row_id": pa.array(range(800), pa.int64()), "text": docs["caption"]}
        )
        res = minhash_dedup(
            ray.data.from_arrow(table).repartition(4),
            cfg=MinHashConfig(num_perm=128, bands=32, rows=4, ngram_size=2,
                              threshold=0.5, hash_func="sha1"),
        )
        kinds = truth["kind"].to_pylist()
        cl = truth["cluster_id"].to_pylist()
        # exact-duplicate truth clusters MUST be found (recall 1.0); near-dup
        # clusters at threshold-ish jaccard are judged in aggregate
        exact_truth = {
            i: c for i, (c, k) in enumerate(zip(cl, kinds)) if k == "exact"
        }
        assert dup_pair_recall(res.parents, exact_truth) == 1.0
        near_truth = {
            i: c for i, (c, k) in enumerate(zip(cl, kinds)) if k in ("exact", "near-hamming")
        }
        assert dup_pair_recall(res.parents, near_truth) >= 0.8
