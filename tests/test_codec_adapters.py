"""The pluggable real-codec seam: adapter registries route unknown formats
to registered decoders (PIL/PyAV in production), the deterministic built-ins
keep working, and in this wheel-less sandbox the autoloads no-op cleanly and
the PIL-backed test auto-skips."""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from text_dedup_ray.functions import codecs

HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_AV = importlib.util.find_spec("av") is not None


@pytest.fixture(autouse=True)
def _clean_registries():
    saved = (
        dict(codecs._IMAGE_DECODERS),
        dict(codecs._IMAGE_ENCODERS),
        dict(codecs._VIDEO_DECODERS),
        dict(codecs._AUDIO_DECODERS),
    )
    yield
    codecs._IMAGE_DECODERS.clear(); codecs._IMAGE_DECODERS.update(saved[0])
    codecs._IMAGE_ENCODERS.clear(); codecs._IMAGE_ENCODERS.update(saved[1])
    codecs._VIDEO_DECODERS.clear(); codecs._VIDEO_DECODERS.update(saved[2])
    codecs._AUDIO_DECODERS.clear(); codecs._AUDIO_DECODERS.update(saved[3])


class TestImageAdapters:
    def test_builtin_codecs_unaffected(self):
        pix = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        assert np.array_equal(
            codecs.decode_image(codecs.encode_image(pix, "png"), "png"), pix
        )

    def test_registered_adapter_takes_precedence(self):
        calls = []

        def fake_decode(data: bytes) -> np.ndarray:
            calls.append(len(data))
            return np.zeros((2, 2, 3), np.uint8)

        codecs.register_image_codec("webp", fake_decode)
        out = codecs.decode_image(b"\x00\x01\x02", "webp")
        assert out.shape == (2, 2, 3) and calls == [3]

    def test_stub_bytes_win_over_registered_jpeg_adapter(self):
        # synthetic corpora label fjpg-stub bytes fmt="jpeg": a registered
        # real-JPEG adapter (e.g. PIL) must never swallow them — the FJPG
        # magic routes to the deterministic stub regardless of adapters
        def exploding(data: bytes):
            raise AssertionError("adapter must not see stub bytes")

        codecs.register_image_codec("jpeg", exploding)
        pix = np.full((4, 4, 3), 77, np.uint8)
        stub = codecs.encode_fjpg(pix)
        out = codecs.decode_image(stub, "jpeg")
        assert codecs.psnr(pix, out) >= 40.0

    def test_unknown_format_raises_with_adapter_hint(self):
        with pytest.raises(NotImplementedError, match="register_image_codec"):
            codecs.decode_image(b"xx", "tiff")

    @pytest.mark.skipif(not HAS_PIL, reason="PIL wheel absent in sandbox")
    def test_pil_autoload_decodes_real_jpeg(self):
        # runs only where pillow is installed: real JPEG round-trip must
        # come back within the PSNR >= 40 dB lossy bound
        assert codecs.autoload_adapters()
        pix = np.random.default_rng(0).integers(
            0, 255, (32, 32, 3), dtype=np.uint8
        )
        blob = codecs.encode_image(pix, "jpeg")
        back = codecs.decode_image(blob, "jpeg")
        assert codecs.psnr(pix, back) >= 30.0  # JPEG default quality bound

    @pytest.mark.skipif(HAS_PIL, reason="only meaningful without PIL")
    def test_autoload_noops_cleanly_without_pil(self):
        codecs._AUTOLOADED = False
        assert codecs.autoload_adapters() is False
        # and jpeg falls back to the deterministic stub, not an error
        pix = np.full((4, 4, 3), 200, np.uint8)
        back = codecs.decode_image(codecs.encode_image(pix, "jpeg"), "jpeg")
        assert codecs.psnr(pix, back) >= 40.0


class TestVideoAudioAdapters:
    def test_video_adapter_slots_into_decode_seam(self):
        from text_dedup_ray.pipelines.video import _decode_rawv

        frames = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        codecs.register_video_decoder(
            "mp4", lambda blob, meta: frames
        )
        out = _decode_rawv(b"container-bytes", 2, 4, 3, "mp4", "vid-0")
        assert np.array_equal(out, frames)

    def test_audio_adapter_slots_into_decode_seam(self):
        from text_dedup_ray.pipelines.audio import _decode_rawa

        pcm = np.arange(100, dtype=np.uint8)
        codecs.register_audio_decoder("flac", lambda blob, meta: pcm)
        out = _decode_rawa(b"container-bytes", 100, "flac", "aud-0")
        assert np.array_equal(out, pcm)

    def test_unregistered_format_raises_with_hint(self):
        from text_dedup_ray.pipelines.video import _decode_rawv

        with pytest.raises(NotImplementedError, match="register_video_decoder"):
            _decode_rawv(b"x", 1, 1, 1, "avi", "vid-0")

    @pytest.mark.skipif(HAS_AV, reason="only meaningful without PyAV")
    def test_av_autoload_noops_cleanly_without_wheel(self):
        codecs._AV_AUTOLOADED = False
        assert codecs.autoload_av_adapters() is False

    def test_rawv_rawa_builtins_unaffected(self):
        from text_dedup_ray.pipelines.audio import _decode_rawa
        from text_dedup_ray.pipelines.video import _decode_rawv

        frames = np.arange(2 * 2 * 2, dtype=np.uint8)
        out = _decode_rawv(frames.tobytes(), 2, 2, 2, "rawv", "vid-1")
        assert out.shape == (2, 2, 2)
        pcm = np.arange(10, dtype=np.uint8)
        assert np.array_equal(_decode_rawa(pcm.tobytes(), 10, "rawa", "aud-1"), pcm)


class TestPcmFrameToU8:
    """The PyAV audio adapter's frame kernel, testable without the wheel."""

    def test_u8_silence_centers_at_128(self):
        import numpy as np

        from text_dedup_ray.functions.codecs import pcm_frame_to_u8

        # unsigned 8-bit PCM: zero point is 128, not 0
        silence = np.full((1, 64), 128, np.uint8)
        out = pcm_frame_to_u8(silence, nch=1)
        assert np.allclose(out, 128.0)
        full_neg = pcm_frame_to_u8(np.zeros((1, 4), np.uint8), nch=1)
        assert np.allclose(full_neg, 1.0)  # -1.0 * 127 + 128

    def test_s16_silence_and_scale(self):
        import numpy as np

        from text_dedup_ray.functions.codecs import pcm_frame_to_u8

        silence = np.zeros((1, 64), np.int16)
        assert np.allclose(pcm_frame_to_u8(silence, nch=1), 128.0)
        # u8 and s16 encodings of the SAME signal agree
        sig = np.sin(np.linspace(0, 6.28, 256))
        as_s16 = (sig * 32767).astype(np.int16)[None, :]
        as_u8 = ((sig * 127) + 128).clip(0, 255).astype(np.uint8)[None, :]
        a, b = pcm_frame_to_u8(as_s16, 1), pcm_frame_to_u8(as_u8, 1)
        assert np.abs(a - b).max() < 2.0

    def test_packed_stereo_deinterleaves(self):
        import numpy as np

        from text_dedup_ray.functions.codecs import pcm_frame_to_u8

        # packed (1, n*2) interleaved L/R; planar (2, n) equivalent must
        # produce the same mono stream
        left = np.arange(8, dtype=np.int16) * 1000
        right = -left
        packed = np.empty((1, 16), np.int16)
        packed[0, 0::2], packed[0, 1::2] = left, right
        planar = np.stack([left, right])
        p1 = pcm_frame_to_u8(packed, nch=2)
        p2 = pcm_frame_to_u8(planar, nch=2)
        assert p1.shape == (8,) and np.allclose(p1, p2)
        assert np.allclose(p1, 128.0)  # L+R cancel -> silence
