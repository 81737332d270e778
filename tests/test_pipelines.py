"""End-to-end pipeline tests vs. the vendored reference-semantics oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.data.gen import generate_corpus
from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.functions.simhash import SimHashConfig
from text_dedup_ray.pipelines.minhash import minhash_dedup
from text_dedup_ray.pipelines.simhash import simhash_dedup

from .reference_impl import (
    dup_pairs,
    minhash_reference_parents,
    simhash_reference_parents,
)

N = 600
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    docs, truth = generate_corpus(N, SEED)
    ids = list(range(N))
    table = pa.table(
        {
            "row_id": pa.array(ids, pa.int64()),
            "text": docs["caption"],
        }
    )
    return table, docs, truth


class TestMinHashPipeline:
    def test_matches_reference_clusters(self, corpus):
        table, _, _ = corpus
        cfg = MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")
        ds = ray.data.from_arrow(table).repartition(4)
        result = minhash_dedup(ds, text_column="text", cfg=cfg)
        ref = minhash_reference_parents(
            table["text"].to_pylist(), table["row_id"].to_pylist(), cfg
        )
        ours = dup_pairs(result.parents)
        theirs = dup_pairs(ref)
        assert theirs, "oracle found no duplicates — corpus is broken"
        recall = len(ours & theirs) / len(theirs)
        assert recall >= 0.99, f"recall {recall}"
        assert ours == theirs  # construction should be exactly equivalent

    def test_deduped_keeps_roots_and_singletons(self, corpus):
        table, _, _ = corpus
        cfg = MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")
        ds = ray.data.from_arrow(table)
        result = minhash_dedup(ds, text_column="text", cfg=cfg)
        out = result.deduped.to_pandas()
        # survivors: every cluster root maps to itself
        assert (out["__CLUSTER__"] == out["row_id"]).all()
        # exactly one survivor per component + all untouched rows (minus short docs)
        n_dupes = sum(1 for m, r in result.parents.items() if m != r)
        filtered_total = result.assigned.count()
        assert len(out) == filtered_total - n_dupes

    def test_exact_dupes_collapse(self, corpus):
        table, _, truth = corpus
        cfg = MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")
        ds = ray.data.from_arrow(table)
        result = minhash_dedup(ds, text_column="text", cfg=cfg)
        kinds = truth["kind"].to_pylist()
        clusters = truth["cluster_id"].to_pylist()
        # all exact-dup truth clusters must be merged by the pipeline
        from collections import defaultdict

        by_truth = defaultdict(list)
        for i, (k, c) in enumerate(zip(kinds, clusters)):
            if k == "exact":
                by_truth[c].append(i)
        assert by_truth
        for members in by_truth.values():
            roots = {result.parents.get(m, m) for m in members}
            assert len(roots) == 1, f"exact cluster not merged: {members}"

    def test_false_positive_check(self, corpus):
        table, _, _ = corpus
        cfg = MinHashConfig(
            num_perm=64, bands=32, rows=2, ngram_size=2, hash_func="sha1",
            threshold=0.6, check_false_positive=True,
        )
        ds = ray.data.from_arrow(table)
        result = minhash_dedup(ds, text_column="text", cfg=cfg)
        assert result.verified_parents is not None
        # verified map must be a subset of candidate members
        assert set(result.verified_parents) <= set(result.parents)


class TestSimHashPipeline:
    def test_matches_reference_clusters(self, corpus):
        table, _, _ = corpus
        cfg = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram_size=3, hash_func="sha1")
        ds = ray.data.from_arrow(table).repartition(4)
        result = simhash_dedup(ds, text_column="text", cfg=cfg)
        ref = simhash_reference_parents(
            table["text"].to_pylist(), table["row_id"].to_pylist(), cfg
        )
        ours = dup_pairs(result.parents)
        theirs = dup_pairs(ref)
        assert theirs, "oracle found no duplicates — corpus is broken"
        recall = len(ours & theirs) / len(theirs)
        assert recall >= 0.99, f"recall {recall}"
        assert ours == theirs

    def test_deduped_drops_nonroots(self, corpus):
        table, _, _ = corpus
        cfg = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram_size=3, hash_func="sha1")
        ds = ray.data.from_arrow(table)
        result = simhash_dedup(ds, text_column="text", cfg=cfg)
        out = result.deduped.to_pandas()
        assert len(out) == N - len(result.parents)
        assert not out["__duplicate__"].any()


class TestRowIdStamping:
    def test_from_key(self):
        from text_dedup_ray.sources.io import stamp_row_ids_from_key

        t = pa.table({"doc_id": pa.array([5, 1, 9], pa.int64()), "x": ["a", "b", "c"]})
        ds = stamp_row_ids_from_key(ray.data.from_arrow(t), "doc_id")
        out = ds.to_pandas().sort_values("doc_id")
        assert out["row_id"].tolist() == [1, 5, 9]

    def test_fragment_offsets(self, tmp_path):
        import pyarrow.parquet as pq

        from text_dedup_ray.sources.io import read_parquet_with_row_ids

        for i in range(3):
            pq.write_table(
                pa.table({"v": pa.array(range(i * 10, i * 10 + 10))}),
                str(tmp_path / f"part-{i}.parquet"),
            )
        ds = read_parquet_with_row_ids(str(tmp_path))
        out = ds.to_pandas().sort_values("row_id")
        assert out["row_id"].tolist() == list(range(30))
        assert out["v"].tolist() == list(range(30))  # row_id follows file order
