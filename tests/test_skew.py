"""Skew fixtures (FIXTURES.md §5): a giant boilerplate bucket must not blow
up any single task, and CC output must stay correct."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.data.gen import generate_corpus
from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.functions.simhash import SimHashConfig
from text_dedup_ray.pipelines.minhash import minhash_dedup
from text_dedup_ray.pipelines.simhash import simhash_dedup


def _skewed_corpus(n=2000, boilerplate_every=10, seed=31):
    docs, _ = generate_corpus(n, seed=seed)
    captions = docs["caption"].to_pylist()
    boiler = "this exact boilerplate caption appears on a large fraction of rows"
    for i in range(0, n, boilerplate_every):
        captions[i] = boiler
    return pa.table(
        {"row_id": pa.array(range(n), pa.int64()), "text": pa.array(captions, pa.string())}
    ), [i for i in range(0, n, boilerplate_every)]


class TestSkew:
    def test_minhash_giant_bucket(self):
        table, boiler_rows = _skewed_corpus()
        cfg = MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")
        res = minhash_dedup(ray.data.from_arrow(table).repartition(8), cfg=cfg)
        # every boilerplate row lands in one cluster rooted at the min id (0)
        roots = {res.parents.get(i, i) for i in boiler_rows}
        assert roots == {0}
        # survivors: exactly one boilerplate row remains
        out = res.deduped.to_pandas()
        assert len(set(out.row_id) & set(boiler_rows)) == 1

    def test_simhash_giant_bucket(self):
        table, boiler_rows = _skewed_corpus(n=1500)
        cfg = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram_size=3, hash_func="sha1")
        res = simhash_dedup(ray.data.from_arrow(table).repartition(8), cfg=cfg)
        roots = {res.parents.get(i, i) for i in boiler_rows}
        assert roots == {0}

    def test_star_edges_bound_bucket_output(self):
        """A degenerate block-sized bucket emits O(members) rows, not O(m^2)."""
        from text_dedup_ray.stages.edges import minhash_local_buckets

        n = 50_000
        batch = pa.table(
            {
                "row_id": pa.array(np.arange(n, dtype=np.int64)),
                "band_idx": pa.array(np.zeros(n, dtype=np.int32)),
                "band_val": pa.array([b"\x00" * 32] * n, pa.binary(32)),
            }
        )
        out = minhash_local_buckets(batch)
        # n-1 star edges + 1 rep — linear, never quadratic
        assert out.num_rows == n
