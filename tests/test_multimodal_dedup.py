"""pipelines/images.multimodal_dedup: OR-fusion of caption-LSH and
phash-Hamming signals, incl. the cross-modality transitive chain."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.images import multimodal_dedup

CFG = MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")


def _table():
    cap = "a very long caption about a mountain lake at golden hour with mist"
    far = "completely different words describing a city street market scene here"
    rows = [
        # 0,1: same caption, far phashes -> caption signal merges
        (0, cap, 0x0123456789ABCDEF),
        (1, cap, -0x7123456789ABCDE0),
        # 2,3: unrelated captions, phashes 1 bit apart -> pixel signal merges
        (2, far, 0x00FF00FF00FF00FF),
        (3, "yet another unrelated caption with its own distinct words okay", 0x00FF00FF00FF00FE),
        # 4: chains to 0/1 via phash of 1 (1 bit from row 1's phash)
        (4, "nothing in common with any other caption in this tiny corpus", -0x7123456789ABCDE0 ^ 1),
        # 5: singleton
        (5, "the lone survivor caption that matches absolutely nothing else", 0x5555AAAA5555AAAA),
    ]
    return pa.table(
        {
            "image_id": [f"img-{i:012d}" for i, _, _ in rows],
            "caption": [c for _, c, _ in rows],
            "phash": pa.array([p for _, _, p in rows], pa.int64()),
        }
    )


def test_or_fusion_and_transitive_chain():
    ds = ray.data.from_arrow(_table())
    out = multimodal_dedup(ds=ds, cfg=CFG, bit_diff=2, num_bucket=4)
    ids = sorted(
        int(i.rsplit("-", 1)[-1]) for i in out.to_pandas()["image_id"].tolist()
    )
    # cluster {0,1,4} (caption 0-1, phash 1-4) -> min 0 survives;
    # cluster {2,3} (phash) -> 2 survives; 5 is a singleton
    assert ids == [0, 2, 5]


def test_phash_only_signal_when_captions_too_short():
    # captions under min_length never fingerprint; phash still dedups
    t = pa.table(
        {
            "image_id": [f"img-{i:012d}" for i in range(2)],
            "caption": ["tiny", "tiny"],
            "phash": pa.array([7, 7], pa.int64()),
        }
    )
    out = multimodal_dedup(ds=ray.data.from_arrow(t), cfg=CFG)
    assert out.to_pandas()["image_id"].tolist() == ["img-000000000000"]
