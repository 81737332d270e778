"""Tile-level perceptual dedup: region-edit variants cluster, crops don't.

The operator's contract (pipelines/images.py tile_phash_near_dedup_parents):
images sharing >= min_agree exact 64-bit tile hashes of a tiles x tiles
grid are duplicates. Watermark / patched-region / re-encode variants keep
most tiles byte-identical; a pixel shift (crop) realigns the grid and must
NOT cluster — that's the documented limitation, asserted here so it can't
silently change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from text_dedup_ray.functions.codecs import encode_fjpg, encode_png
from text_dedup_ray.pipelines.images import (
    TileHashStage,
    tile_phash_near_dedup_parents,
)


def _img(seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (32, 32, 3), np.uint8)


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "row_id": pa.array([r[0] for r in rows], pa.int64()),
                "bytes": pa.array([r[1] for r in rows], pa.binary()),
                "fmt": pa.array([r[2] for r in rows]),
            }
        )
    ).repartition(2)


def _parents(rows, **kw):
    p = tile_phash_near_dedup_parents(_ds(rows), **kw)
    if not isinstance(p, dict):
        t = p.to_pandas()
        p = dict(zip(t["row_id"], t["cluster_id"]))
    return p


def test_watermark_and_reencode_cluster_but_crop_does_not():
    base = _img(1)
    watermarked = base.copy()
    watermarked[0:8, 0:8] = 255  # exactly one 4x4-grid tile region edited
    shifted = np.roll(base, 3, axis=1)  # crop-like grid realignment
    rows = [
        (0, encode_png(base), "png"),
        (1, encode_png(watermarked), "png"),  # 15/16 tiles identical
        (2, encode_fjpg(base), "fjpg"),  # re-encode of the same pixels
        (3, encode_png(shifted), "png"),
        (4, encode_png(_img(99)), "png"),  # unrelated
    ]
    parents = _parents(rows, tiles=4, min_agree=12, num_partitions=4)
    root = parents.get(0, 0)
    assert parents.get(1, 1) == root  # watermark variant merged
    assert parents.get(3, 3) != root  # shift breaks the tile grid (documented)
    assert parents.get(4, 4) != root


def test_reencode_fjpg_needs_lower_agreement_on_noise():
    # Lossy re-encode of RANDOM-NOISE pixels flips roughly half the exact
    # per-pixel-threshold tile hashes (seed 7: 8/16 agree at PSNR ~46 dB) —
    # the documented trade-off: exact tile match is for byte-preserving
    # edits; lossy variants need a lower min_agree (or the global-phash
    # Hamming path). Natural smooth images agree far more.
    base = _img(7)
    rows = [(0, encode_png(base), "png"), (1, encode_fjpg(base), "fjpg")]
    parents = _parents(rows, tiles=4, min_agree=12, num_partitions=2)
    assert parents.get(1, 1) != parents.get(0, 0)  # strict: no merge
    parents = _parents(rows, tiles=4, min_agree=6, num_partitions=2)
    assert parents.get(1, 1) == parents.get(0, 0)  # relaxed: merges


def test_df_cap_skips_boilerplate_buckets():
    # 6 identical uniform images: every tile bucket has size 6 > df_cap=4,
    # so no pairs are emitted at all — the boilerplate-tile escape hatch
    flat = np.zeros((32, 32, 3), np.uint8)
    rows = [(i, encode_png(flat), "png") for i in range(6)]
    parents = _parents(rows, tiles=4, min_agree=12, num_partitions=2, df_cap=4)
    assert all(parents.get(i, i) == i for i in range(6))
    # with an adequate cap they all merge
    parents = _parents(rows, tiles=4, min_agree=12, num_partitions=2, df_cap=64)
    assert len({parents.get(i, i) for i in range(6)}) == 1


def test_decode_failure_rows_are_skipped():
    base = _img(3)
    rows = [
        (0, encode_png(base), "png"),
        (1, b"\x00garbage", "png"),
        (2, encode_png(base), "png"),
    ]
    parents = _parents(rows, tiles=4, min_agree=12, num_partitions=2)
    assert parents.get(2, 2) == parents.get(0, 0)
    assert parents.get(1, 1) == 1  # garbage row untouched


def test_tile_stage_emits_k2_rows_per_image():
    base = _img(5)
    stage = TileHashStage(tiles=4)
    out = stage(
        pa.table(
            {
                "row_id": pa.array([9], pa.int64()),
                "bytes": pa.array([encode_png(base)], pa.binary()),
                "fmt": pa.array(["png"]),
            }
        )
    )
    assert out.num_rows == 16
    assert out["tile_idx"].to_pylist() == list(range(16))
    # deterministic: same pixels -> same 16 hashes
    again = stage(
        pa.table(
            {
                "row_id": pa.array([10], pa.int64()),
                "bytes": pa.array([encode_png(base)], pa.binary()),
                "fmt": pa.array(["png"]),
            }
        )
    )
    assert out["tile_hash"].to_pylist() == again["tile_hash"].to_pylist()


class TestVectorizedStackParity:
    def test_stack_path_bit_identical_to_scalar(self):
        """The shape-grouped vectorized tile hashing must reproduce the
        scalar per-tile average_phash bit-for-bit (it feeds exact-match
        bucketing — one flipped bit changes clusters)."""
        import numpy as np
        import pyarrow as pa

        from text_dedup_ray.data.gen import generate_corpus
        from text_dedup_ray.functions.codecs import decode_image
        from text_dedup_ray.pipelines.images import TileHashStage
        from text_dedup_ray.sources.io import ROW_ID

        docs, _ = generate_corpus(300, seed=17)
        st = TileHashStage(tiles=4)
        batch = pa.table(
            {
                ROW_ID: list(range(300)),
                "bytes": docs["bytes"],
                "fmt": docs["fmt"],
            }
        )
        out = st(batch)
        got = {}
        for rid, ti, th in zip(
            out["row_id"].to_pylist(),
            out["tile_idx"].to_pylist(),
            out["tile_hash"].to_pylist(),
        ):
            got[(rid, ti)] = th
        for i, (b, f) in enumerate(
            zip(docs["bytes"].to_pylist(), docs["fmt"].to_pylist())
        ):
            ref = st._hash_tiles_scalar(decode_image(b, f))
            for ti in range(16):
                assert got[(i, ti)] == int(ref[ti])

    def test_irregular_geometry_falls_back(self):
        import numpy as np
        import pyarrow as pa

        from text_dedup_ray.functions.codecs import encode_png
        from text_dedup_ray.pipelines.images import TileHashStage
        from text_dedup_ray.sources.io import ROW_ID

        rng = np.random.default_rng(4)
        pix = rng.integers(0, 256, (33, 31, 3), dtype=np.uint8)  # not /4 /8
        batch = pa.table(
            {
                ROW_ID: [7],
                "bytes": [encode_png(pix)],
                "fmt": ["png"],
            }
        )
        out = TileHashStage(tiles=4)(batch)
        assert out.num_rows == 16
