"""minhash_threshold_sweep: per-config duplicate/survivor counts must equal
full minhash_dedup runs at the same configs (one shared fingerprint pass,
re-banded by byte slicing); the S-curve estimate orders configs; invalid
configs raise."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.minhash import minhash_dedup, minhash_threshold_sweep

CONFIGS = [(16, 4), (8, 8), (32, 2)]


def _corpus(n=120, seed=13):
    rng = random.Random(seed)
    vocab = [f"w{c}" for c in range(400)]
    texts = [" ".join(rng.choice(vocab) for _ in range(18)) for _ in range(n)]
    # plant exact dups and near-dups (2 words changed of 18)
    for i in range(0, min(30, n - 2), 3):
        texts[i + 1] = texts[i]
        words = texts[i].split()
        words[4], words[9] = "zza", "zzb"
        texts[i + 2] = " ".join(words)
    return pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": texts}
    )


def test_sweep_counts_match_full_runs():
    t = _corpus()
    cfg = MinHashConfig(num_perm=64, bands=16, rows=4, hash_func="sha1",
                        ngram_size=2)
    sweep = (
        minhash_threshold_sweep(
            ray.data.from_arrow(t), cfg=cfg, band_configs=CONFIGS,
            id_column="doc_id", merge_partitions=4,
        )
        .to_pandas()
        .set_index(["bands", "rows_per_band"])
    )
    assert len(sweep) == len(CONFIGS)
    for b, r in CONFIGS:
        full = minhash_dedup(
            ray.data.from_arrow(t),
            id_column="doc_id",
            cfg=MinHashConfig(num_perm=64, bands=b, rows=r, hash_func="sha1",
                              ngram_size=2),
        )
        dups = sum(1 for m, root in full.parents.items() if m != root)
        row = sweep.loc[(b, r)]
        assert row["duplicate_rows"] == dups, (b, r)
        assert row["survivors"] == row["n_docs"] - dups
    # S-curve midpoints: more bands with fewer rows -> lower threshold
    est = sweep["threshold_est"]
    assert est.loc[(32, 2)] < est.loc[(16, 4)] < est.loc[(8, 8)]
    # permissive configs find at least as many dups as strict ones
    assert (
        sweep.loc[(32, 2), "duplicate_rows"]
        >= sweep.loc[(8, 8), "duplicate_rows"]
    )


def test_sweep_rejects_oversized_config():
    t = _corpus(n=10)
    with pytest.raises(ValueError, match="needs 128 permutations"):
        minhash_threshold_sweep(
            ray.data.from_arrow(t),
            cfg=MinHashConfig(num_perm=64, hash_func="sha1"),
            band_configs=[(32, 4)],
            id_column="doc_id",
        )
