"""Tests for the pure-python image codecs and pixel metrics."""

from __future__ import annotations

import numpy as np
import pytest

from text_dedup_ray.functions.codecs import (
    average_phash,
    decode_fjpg,
    decode_image,
    decode_png,
    encode_fjpg,
    encode_image,
    encode_png,
    psnr,
)


def _img(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestPng:
    def test_roundtrip_lossless(self):
        img = _img(0)
        out = decode_png(encode_png(img))
        np.testing.assert_array_equal(img, out)

    def test_nonsquare(self):
        img = _img(1, h=7, w=13)
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_png(b"not a png")


class TestFjpg:
    def test_lossy_but_high_psnr(self):
        img = _img(2)
        out = decode_fjpg(encode_fjpg(img))
        assert out.shape == img.shape
        p = psnr(img, out)
        assert 40.0 <= p < 60.0  # lossy, but above the 40 dB invariant

    def test_deterministic(self):
        img = _img(3)
        assert encode_fjpg(img) == encode_fjpg(img)


class TestDispatch:
    def test_fmt_dispatch(self):
        img = _img(4)
        assert decode_image(encode_image(img, "png"), "png").shape == img.shape
        assert decode_image(encode_image(img, "jpeg"), "jpeg").shape == img.shape
        with pytest.raises(NotImplementedError):
            encode_image(img, "webp")


class TestMetrics:
    def test_psnr_identity(self):
        img = _img(5)
        assert psnr(img, img) == float("inf")
        noisy = img.copy()
        noisy[0, 0, 0] ^= 255
        assert psnr(img, noisy) < float("inf")

    def test_phash_stability(self):
        img = _img(6, h=64, w=64)
        h1 = average_phash(img)
        assert h1 == average_phash(img)
        assert -(2**63) <= h1 < 2**63
        # re-encoding through the lossy codec should barely move the phash
        h2 = average_phash(decode_fjpg(encode_fjpg(img)))
        assert bin(np.uint64(h1 ^ h2) & np.uint64((1 << 64) - 1)).count("1") <= 4
