"""simhash_threshold_sweep: per-radius duplicate/survivor counts must equal
full simhash_dedup runs at the same bit_diff (one shared signature pass,
re-keyed per radius); monotone: a larger radius can only flag more
duplicates; invalid radii raise."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.functions.simhash import SimHashConfig
from text_dedup_ray.pipelines.simhash import simhash_dedup, simhash_threshold_sweep

RADII = [1, 2, 3]


def _corpus(n=100, seed=5):
    rng = random.Random(seed)
    vocab = [f"tok{c}" for c in range(250)]
    texts = [" ".join(rng.choice(vocab) for _ in range(20)) for _ in range(n)]
    for i in range(0, min(30, n - 2), 3):
        texts[i + 1] = texts[i]
        words = texts[i].split()
        words[5] = "changed"
        texts[i + 2] = " ".join(words)
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})


def test_sweep_counts_match_full_runs():
    t = _corpus()
    cfg = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram_size=3,
                        hash_func="sha1")
    sweep = (
        simhash_threshold_sweep(
            ray.data.from_arrow(t), cfg=cfg, bit_diffs=RADII,
            id_column="doc_id", merge_partitions=4,
        )
        .to_pandas()
        .set_index("bit_diff")
    )
    assert list(sweep.index) == RADII
    for k in RADII:
        full = simhash_dedup(
            ray.data.from_arrow(t),
            id_column="doc_id",
            cfg=SimHashConfig(f=64, bit_diff=k, num_bucket=4, ngram_size=3,
                              hash_func="sha1"),
        )
        dups = sum(1 for m, r in full.parents.items() if m != r)
        row = sweep.loc[k]
        assert row["duplicate_rows"] == dups, k
        assert row["survivors"] == row["n_docs"] - dups
    # a larger Hamming ball can only flag more (or equal) duplicates
    d = sweep["duplicate_rows"]
    assert d.loc[1] <= d.loc[2] <= d.loc[3]
    # P(b, b-k): smaller radius -> more permutations
    p = sweep["n_perms"]
    assert p.loc[1] > p.loc[2] > p.loc[3]


def test_sweep_rejects_bad_radius():
    t = _corpus(n=12)
    cfg = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram_size=3,
                        hash_func="sha1")
    with pytest.raises(ValueError, match="bit_diff"):
        simhash_threshold_sweep(
            ray.data.from_arrow(t), cfg=cfg, bit_diffs=[4], id_column="doc_id"
        )
