"""Reference parity at the OFFICIAL benchmark configs (BASELINE gate).

Configs mirror the reference's published benchmark runs
(configs/benchmark_core_minhash.toml: num_perm=200, bands=50, rows=4,
ngram=2; configs/benchmark_core_simhash.toml: f=64, bit_diff=7,
num_bucket=8, ngram=1). The BASELINE criterion is dup-pair recall >= 0.99
vs the reference clustering at identical config; our construction is
designed to be exactly equivalent, so we assert full pair-set equality
(recall = precision = 1.0)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from text_dedup_ray.data.gen import generate_corpus
from text_dedup_ray.functions.evaluation import pair_metrics
from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.functions.simhash import SimHashConfig
from text_dedup_ray.pipelines.minhash import minhash_dedup
from text_dedup_ray.pipelines.simhash import simhash_dedup

from .reference_impl import (
    dup_pairs,
    minhash_reference_parents,
    simhash_reference_parents,
)

N = 2000


def _table():
    docs, _ = generate_corpus(N, seed=99)
    return pa.table(
        {"row_id": pa.array(range(N), pa.int64()), "text": docs["caption"]}
    )


class TestOfficialConfigs:
    def test_minhash_core_config(self):
        cfg = MinHashConfig(
            num_perm=200, bands=50, rows=4, ngram_size=2, threshold=0.5,
            min_length=5, hash_func="sha1", seed=42,
        )
        table = _table()
        res = minhash_dedup(ray.data.from_arrow(table).repartition(6), cfg=cfg)
        ref = minhash_reference_parents(
            table["text"].to_pylist(), table["row_id"].to_pylist(), cfg
        )
        ours, theirs = dup_pairs(res.parents), dup_pairs(ref)
        assert theirs
        m = pair_metrics(ours, theirs)
        assert m["recall"] >= 0.99 and m["precision"] >= 0.99
        assert ours == theirs

    def test_simhash_core_config(self):
        cfg = SimHashConfig(
            f=64, bit_diff=7, num_bucket=8, ngram_size=1, min_length=5,
            hash_func="sha1", seed=42,
        )
        table = _table()
        res = simhash_dedup(ray.data.from_arrow(table).repartition(6), cfg=cfg)
        ref = simhash_reference_parents(
            table["text"].to_pylist(), table["row_id"].to_pylist(), cfg
        )
        ours, theirs = dup_pairs(res.parents), dup_pairs(ref)
        assert theirs
        m = pair_metrics(ours, theirs)
        assert m["recall"] >= 0.99 and m["precision"] >= 0.99
        assert ours == theirs

    def test_minhash_news_config(self):
        # configs/benchmark_news_minhash.toml: num_perm=256, ngram=2, thr=0.45
        cfg = MinHashConfig(
            num_perm=256, bands=None, rows=None, ngram_size=2, threshold=0.45,
            min_length=5, hash_func="sha1", seed=42,
        )
        assert cfg.bands * cfg.rows <= 256  # optimal_param ran
        table = _table()
        res = minhash_dedup(ray.data.from_arrow(table).repartition(4), cfg=cfg)
        ref = minhash_reference_parents(
            table["text"].to_pylist(), table["row_id"].to_pylist(), cfg
        )
        assert dup_pairs(res.parents) == dup_pairs(ref)
