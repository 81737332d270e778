"""The automatic scale fallbacks must produce EXACTLY the driver-path
results (VERDICT r1 #1): forcing ``driver_threshold=0`` routes minhash /
simhash through distributed CC + sharded object-store assignment, and
``broadcast_limit=0`` routes exact dedup through the payload-shuffle path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.data.gen import generate_corpus
from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.functions.simhash import SimHashConfig
from text_dedup_ray.pipelines.exact import exact_cluster_table, exact_dedup
from text_dedup_ray.pipelines.minhash import minhash_dedup
from text_dedup_ray.pipelines.simhash import simhash_dedup

N = 400
SEED = 42


@pytest.fixture(scope="module")
def corpus_table():
    docs, _ = generate_corpus(N, SEED)
    return pa.table(
        {
            "row_id": pa.array(list(range(N)), pa.int64()),
            "text": docs["caption"],
        }
    )


def _cluster_frame(ds: ray.data.Dataset):
    df = ds.to_pandas()[["row_id", "__CLUSTER__", "__duplicate__"]]
    return df.sort_values("row_id").reset_index(drop=True)


class TestMinHashDistributedFallback:
    def test_forced_distributed_matches_driver_path(self, corpus_table):
        cfg = MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")
        ds = ray.data.from_arrow(corpus_table).repartition(4)

        res_driver = minhash_dedup(ds, text_column="text", cfg=cfg, merge_partitions=8)
        res_dist = minhash_dedup(
            ds, text_column="text", cfg=cfg, merge_partitions=8, driver_threshold=0
        )
        assert res_driver.metrics["cc_path"] == "driver"
        assert res_dist.metrics["cc_path"] == "distributed"
        assert isinstance(res_dist.parents, ray.data.Dataset)

        a = _cluster_frame(res_driver.assigned)
        b = _cluster_frame(res_dist.assigned)
        assert (a["__CLUSTER__"].to_numpy() == b["__CLUSTER__"].to_numpy()).all()
        # minhash semantics: roots of multi-member clusters are duplicates too
        assert (a["__duplicate__"].to_numpy() == b["__duplicate__"].to_numpy()).all()

        da = res_driver.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        db = res_dist.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        assert list(da["row_id"]) == list(db["row_id"])


class TestSimHashDistributedFallback:
    def test_forced_distributed_matches_driver_path(self, corpus_table):
        cfg = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram_size=3, hash_func="sha1")
        ds = ray.data.from_arrow(corpus_table).repartition(4)

        res_driver = simhash_dedup(ds, text_column="text", cfg=cfg, merge_partitions=8)
        res_dist = simhash_dedup(
            ds, text_column="text", cfg=cfg, merge_partitions=8, driver_threshold=0
        )
        assert isinstance(res_dist.parents, ray.data.Dataset)

        a = _cluster_frame(res_driver.assigned)
        b = _cluster_frame(res_dist.assigned)
        assert (a["__CLUSTER__"].to_numpy() == b["__CLUSTER__"].to_numpy()).all()
        # simhash semantics: duplicate flag marks NON-ROOT members only
        assert (a["__duplicate__"].to_numpy() == b["__duplicate__"].to_numpy()).all()

        da = res_driver.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        db = res_dist.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        assert list(da["row_id"]) == list(db["row_id"])


class TestExactShufflePath:
    def test_shuffle_path_matches_broadcast_path(self, corpus_table):
        ds = ray.data.from_arrow(corpus_table).repartition(4)
        a = (
            exact_dedup(ds, text_column="text")
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        b = (
            exact_dedup(ds, text_column="text", broadcast_limit=0)
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        assert list(a["row_id"]) == list(b["row_id"])
        assert list(a["text"]) == list(b["text"])
        # first-occurrence-wins: min row_id per distinct text survives
        texts = corpus_table["text"].to_pylist()
        first = {}
        for i, t in enumerate(texts):
            first.setdefault(t, i)
        assert sorted(first.values()) == list(a["row_id"])

    def test_cluster_table_is_min_per_text_without_driver_state(self, corpus_table):
        ds = ray.data.from_arrow(corpus_table).repartition(4)
        out = (
            exact_cluster_table(ds, text_column="text")
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        texts = corpus_table["text"].to_pylist()
        expect_min: dict[str, int] = {}
        for i, t in enumerate(texts):
            expect_min[t] = min(expect_min.get(t, i), i)
        expected = [expect_min[t] for t in texts]
        assert len(out) == N
        assert list(out["cluster_id"]) == expected


class TestVerifyDistributedFallback:
    """The verify stage's auto contract (VERDICT r2 #1): driver_threshold=0
    forces the verified map to stay a Dataset and route reassignment through
    assign_clusters_sharded — results must match the driver-dict path."""

    def test_minhash_verified_forced_distributed(self, corpus_table):
        cfg = MinHashConfig(
            num_perm=64, bands=32, rows=2, ngram_size=2, hash_func="sha1",
            threshold=0.6, check_false_positive=True,
        )
        ds = ray.data.from_arrow(corpus_table).repartition(4)
        res_driver = minhash_dedup(ds, text_column="text", cfg=cfg, merge_partitions=8)
        res_dist = minhash_dedup(
            ds, text_column="text", cfg=cfg, merge_partitions=8, driver_threshold=0
        )
        assert isinstance(res_driver.verified_parents, dict)
        assert isinstance(res_dist.verified_parents, ray.data.Dataset)

        a = _cluster_frame(res_driver.assigned)
        b = _cluster_frame(res_dist.assigned)
        assert (a["__CLUSTER__"].to_numpy() == b["__CLUSTER__"].to_numpy()).all()
        assert (a["__duplicate__"].to_numpy() == b["__duplicate__"].to_numpy()).all()
        da = res_driver.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        db = res_dist.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        assert (da["row_id"].to_numpy() == db["row_id"].to_numpy()).all()
        # the verify pass must have actually moved something vs no-verify,
        # else this test exercises nothing
        res_plain = minhash_dedup(
            ds, text_column="text",
            cfg=MinHashConfig(num_perm=64, bands=32, rows=2, ngram_size=2,
                              hash_func="sha1"),
            merge_partitions=8,
        )
        assert res_plain.deduped.count() != res_driver.deduped.count()

    def test_simhash_verified_forced_distributed(self, corpus_table):
        cfg = SimHashConfig(
            f=64, bit_diff=3, num_bucket=4, ngram_size=3, hash_func="sha1",
            check_false_positive=True, jaccard_threshold=0.5,
        )
        ds = ray.data.from_arrow(corpus_table).repartition(4)
        res_driver = simhash_dedup(ds, text_column="text", cfg=cfg, merge_partitions=8)
        res_dist = simhash_dedup(
            ds, text_column="text", cfg=cfg, merge_partitions=8, driver_threshold=0
        )
        assert isinstance(res_driver.verified_parents, dict)
        assert isinstance(res_dist.verified_parents, ray.data.Dataset)
        a = _cluster_frame(res_driver.assigned)
        b = _cluster_frame(res_dist.assigned)
        assert (a["__CLUSTER__"].to_numpy() == b["__CLUSTER__"].to_numpy()).all()
        # simhash keeps the stale PRE-verification flag on both paths
        assert (a["__duplicate__"].to_numpy() == b["__duplicate__"].to_numpy()).all()
