"""Pure-python XXH3-64 (functions/xxh3.py): canonical vector, structural
properties, wheel cross-check (runs wherever the xxhash wheel exists — this
sandbox has none, so the cross-check skips and the reference's default-hash
config still executes end-to-end)."""

from __future__ import annotations

import pytest

from text_dedup_ray.functions.hashing import HAS_XXHASH, xxh3_hash
from text_dedup_ray.functions.xxh3 import xxh3_64


def test_canonical_empty_vector():
    # XXH3_64bits("") — published canonical digest
    assert xxh3_64(b"") == 0x2D06800538D394C2


def test_basic_properties():
    assert 0 <= xxh3_64(b"hello world") < 1 << 64
    assert xxh3_64(b"hello") != xxh3_64(b"hellp")
    assert xxh3_64(b"x", 1) != xxh3_64(b"x", 2)
    # every length-class dispatch path executes and is deterministic
    for n in (0, 1, 3, 4, 8, 9, 16, 17, 128, 129, 240, 241, 1024, 1025, 5000):
        data = bytes(range(256)) * (n // 256 + 1)
        assert xxh3_64(data[:n]) == xxh3_64(data[:n])
        assert xxh3_64(data[:n], 42) == xxh3_64(data[:n], 42)


def test_hash_func_xxh3_usable_without_wheel():
    from text_dedup_ray.functions.hashing import make_hash_func

    f32 = make_hash_func("xxh3", seed=42, bits=32)
    f64 = make_hash_func("xxh3", seed=42, bits=64)
    assert f32(b"shingle bytes") == f64(b"shingle bytes") & 0xFFFFFFFF
    assert 0 <= f32(b"shingle bytes") < 1 << 32


def test_minhash_pipeline_runs_with_xxh3(ray_session):
    """The reference's default-hash config executes end-to-end."""
    import pyarrow as pa
    import ray.data

    from text_dedup_ray.functions.minhash import MinHashConfig
    from text_dedup_ray.pipelines.minhash import minhash_dedup

    import random

    rng = random.Random(3)
    vocab = [f"w{c}" for c in range(500)]
    texts = ["alpha beta gamma delta epsilon zeta"] * 3 + [
        " ".join(rng.sample(vocab, 20)) for _ in range(20)
    ]
    ds = ray.data.from_arrow(
        pa.table({"row_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    )
    res = minhash_dedup(
        ds,
        text_column="text",
        cfg=MinHashConfig(num_perm=32, bands=8, rows=4, ngram_size=2, min_length=0,
                          hash_func="xxh3"),
    )
    out = res.deduped.to_pandas()
    assert 0 in out["row_id"].tolist()
    assert 1 not in out["row_id"].tolist()  # exact dupes collapse
    assert len(out) == 21


@pytest.mark.skipif(not HAS_XXHASH, reason="xxhash wheel absent in this sandbox")
def test_cross_check_against_wheel():
    import random

    import xxhash

    rng = random.Random(7)
    for n in (0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 63, 128, 129, 200, 240, 241,
              512, 1023, 1024, 1025, 4096, 10000):
        data = bytes(rng.randrange(256) for _ in range(n))
        for seed in (0, 1, 42, (1 << 64) - 5):
            assert xxh3_64(data, seed) == xxhash.xxh3_64_intdigest(data, seed), (n, seed)
