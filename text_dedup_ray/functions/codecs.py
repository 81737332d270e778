"""Image codecs + pixel metrics for the image+caption table.

The BASELINE input_hint table carries images as opaque ``binary`` with typed
metadata ``(w, h, fmt)``. No image libraries (PIL etc.) exist in this
environment, so:

- ``png``: a real, self-contained PNG codec (RGB8, filter 0) built on stdlib
  zlib — lossless, round-trips bit-exact, readable by any standard viewer.
- ``fjpg``: a STUB for lossy JPEG. Deterministic fake codec — quantizes each
  channel to 6 bits (midpoint reconstruction, worst-case error 2/255 →
  PSNR ≈ 46 dB) and zlib-compresses. It exercises the real concern (lossy
  re-encode must keep PSNR >= 40 dB per surviving row) with real plumbing;
  swap ``encode_fjpg``/``decode_fjpg`` for libjpeg bindings in production.

Plus ``psnr`` and ``average_phash`` (8x8 mean-threshold perceptual hash ->
int64), the deterministic phash definition used by the synthetic corpus
generator and the per-row invariant checks.

Real codecs plug in through the adapter registries below
(``register_image_codec`` / ``register_video_decoder`` /
``register_audio_decoder``): when the PIL or PyAV wheel exists,
``autoload_adapters`` / ``autoload_av_adapters`` register JPEG/WebP/MP4/FLAC
decoders automatically — and because the autoload runs LAZILY at the first
unknown-format decode, it fires inside every Ray worker process without any
registration plumbing. Manual ``register_*`` calls are per-process: to use a
custom adapter inside ``map_batches`` actors, register it in the stage's
``__init__`` (once per actor), not on the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a standard RGB8 PNG (filter 0)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by :func:`encode_png` (filter 0 only)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only RGB8 supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8).reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("only filter type 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


_FJPG_MAGIC = b"FJPG"


def encode_fjpg(pixels: np.ndarray) -> bytes:
    """STUB lossy codec (see module docstring): 6-bit quantize + zlib."""
    h, w, c = pixels.shape
    q = pixels >> 2
    header = _FJPG_MAGIC + struct.pack(">II", w, h)
    return header + zlib.compress(q.tobytes(), 6)


def decode_fjpg(data: bytes) -> np.ndarray:
    if data[:4] != _FJPG_MAGIC:
        raise ValueError("not an FJPG payload")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q << 2) | 2).astype(np.uint8)  # midpoint reconstruction


# --- pluggable codec adapter registry ---------------------------------------
# Real corpora are JPEG/WebP/MP4/FLAC. The deterministic built-ins above are
# the sandbox fallback; production slots real wheels in through this registry
# (one `pip install pillow` / `pip install av` away) and every pipeline decode
# seam — images.py, video.py, audio.py — picks the adapter up without any
# pipeline code change. Adapters are keyed by the table's ``fmt`` string.
#
# decode signature: (data: bytes) -> (h, w, 3) uint8   [images]
#                   (data: bytes, meta: dict) -> np.ndarray  [video/audio]
# encode signature: (pixels: (h, w, 3) uint8) -> bytes

_IMAGE_DECODERS: dict = {}
_IMAGE_ENCODERS: dict = {}
_AUTOLOADED = False


def register_image_codec(fmt: str, decode_fn, encode_fn=None) -> None:
    """Plug a real codec in for ``fmt`` (e.g. PIL's JPEG). Registered
    adapters take precedence over the deterministic built-ins."""
    _IMAGE_DECODERS[fmt] = decode_fn
    if encode_fn is not None:
        _IMAGE_ENCODERS[fmt] = encode_fn


def registered_image_codecs() -> tuple:
    return tuple(sorted(_IMAGE_DECODERS))


def autoload_adapters() -> bool:
    """Try to register real-codec adapters from optional wheels (PIL for
    images). Idempotent; returns True iff any adapter is registered. Called
    lazily on the first unknown-format decode, so the sandbox (no wheels)
    pays nothing and a PIL-equipped install decodes real JPEG/WebP with no
    configuration."""
    global _AUTOLOADED
    if _AUTOLOADED:
        return bool(_IMAGE_DECODERS)
    _AUTOLOADED = True
    try:
        import io

        from PIL import Image  # optional wheel, absent in this sandbox
    except ImportError:
        return bool(_IMAGE_DECODERS)

    def _pil_decode(data: bytes) -> np.ndarray:
        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)

    def _pil_encode(fmt_name):
        def enc(pixels: np.ndarray) -> bytes:
            buf = io.BytesIO()
            Image.fromarray(pixels, "RGB").save(buf, format=fmt_name)
            return buf.getvalue()

        return enc

    for fmt, pil_name in (("jpeg", "JPEG"), ("webp", "WEBP"), ("bmp", "BMP")):
        register_image_codec(fmt, _pil_decode, _pil_encode(pil_name))
    # real-PNG decode stays with the stdlib codec above unless PIL is asked
    # for explicitly — both produce identical RGB8 pixels for filter-0 files
    return bool(_IMAGE_DECODERS)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt in _IMAGE_ENCODERS:
        return _IMAGE_ENCODERS[fmt](pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "fjpg":
        return encode_fjpg(pixels)
    if autoload_adapters() and fmt in _IMAGE_ENCODERS:
        return _IMAGE_ENCODERS[fmt](pixels)
    if fmt == "jpeg":
        return encode_fjpg(pixels)  # sandbox fallback (no PIL): fake-JPEG stub
    raise NotImplementedError(
        f"codec {fmt!r} not available: no wheel registered an adapter "
        "(pip install pillow, or register_image_codec)"
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    # magic sniff FIRST: synthetic corpora label deterministic fjpg-stub
    # bytes fmt="jpeg", so a registered real-JPEG adapter (PIL) must not
    # swallow them — stub bytes always decode via the stub, real JPEG
    # (FFD8) / PNG bytes go to whatever codec is registered for the fmt
    if data[:4] == _FJPG_MAGIC:
        return decode_fjpg(data)
    if fmt in _IMAGE_DECODERS:
        return _IMAGE_DECODERS[fmt](data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "fjpg":
        return decode_fjpg(data)
    if autoload_adapters() and fmt in _IMAGE_DECODERS:
        return _IMAGE_DECODERS[fmt](data)
    if fmt == "jpeg":
        # sandbox fallback: the deterministic fake-JPEG stub (see module
        # docstring) — swapped for libjpeg automatically when PIL exists
        return decode_fjpg(data)
    raise NotImplementedError(
        f"codec {fmt!r} not available: no wheel registered an adapter "
        "(pip install pillow, or register_image_codec)"
    )


# --- video / audio adapter registries ----------------------------------------
# Same seam as images: pipelines/video.py decodes through
# ``get_video_decoder(fmt)`` -> (blob, meta) -> (n_frames, h, w) uint8
# grayscale frames, pipelines/audio.py through ``get_audio_decoder(fmt)`` ->
# (blob, meta) -> uint8 PCM sample vector. The deterministic rawv/rawa
# containers are built into those pipelines; a PyAV adapter registers real
# MP4/FLAC decode here when the wheel exists (absent in this sandbox, so
# ``autoload_av_adapters`` cleanly no-ops and tests auto-skip).

_VIDEO_DECODERS: dict = {}
_AUDIO_DECODERS: dict = {}
_AV_AUTOLOADED = False


def register_video_decoder(fmt: str, decode_fn) -> None:
    _VIDEO_DECODERS[fmt] = decode_fn


def register_audio_decoder(fmt: str, decode_fn) -> None:
    _AUDIO_DECODERS[fmt] = decode_fn


def pcm_frame_to_u8(pcm: np.ndarray, nch: int) -> np.ndarray:
    """One decoded PCM frame -> the engine's mono uint8 sample stream.
    Handles the layouts PyAV's ``frame.to_ndarray()`` produces:

    - PACKED (non-planar) multichannel frames arrive as (1, samples*ch)
      with channels interleaved — de-interleave BEFORE any channel math
      (``mean(axis=0)`` on the singleton axis is a no-op and would leave
      ch*n interleaved samples);
    - integer PCM is signed except u8, whose zero point is 2^(bits-1) —
      dividing u8 by the signed max would shift silence by half scale."""
    if pcm.ndim > 1 and pcm.shape[0] == 1 and nch > 1:
        pcm = pcm.reshape(-1, nch).T
    if np.issubdtype(pcm.dtype, np.unsignedinteger):
        half = float(np.iinfo(pcm.dtype).max + 1) / 2.0
        pcm = (pcm.astype(np.float64) - half) / half
    elif np.issubdtype(pcm.dtype, np.integer):
        pcm = pcm.astype(np.float64) / float(np.iinfo(pcm.dtype).max + 1)
    mono = pcm.mean(axis=0) if pcm.ndim > 1 else pcm
    return ((mono * 127.0) + 128.0).clip(0, 255)


def autoload_av_adapters() -> bool:
    """Register PyAV-backed video/audio decoders when the ``av`` wheel is
    importable. Idempotent; returns True iff any adapter is registered."""
    global _AV_AUTOLOADED
    if _AV_AUTOLOADED:
        return bool(_VIDEO_DECODERS or _AUDIO_DECODERS)
    _AV_AUTOLOADED = True
    try:
        import io

        import av  # optional wheel, absent in this sandbox
    except ImportError:
        return bool(_VIDEO_DECODERS or _AUDIO_DECODERS)

    def _av_video(blob: bytes, meta: dict) -> np.ndarray:
        frames = []
        with av.open(io.BytesIO(blob)) as container:
            for frame in container.decode(video=0):
                frames.append(
                    np.asarray(frame.to_image().convert("L"), dtype=np.uint8)
                )
        return np.stack(frames) if frames else np.empty((0, 0, 0), np.uint8)

    def _av_audio(blob: bytes, meta: dict) -> np.ndarray:
        chunks = []
        with av.open(io.BytesIO(blob)) as container:
            for frame in container.decode(audio=0):
                nch = getattr(frame.layout, "nb_channels", None) or len(
                    frame.layout.channels
                )
                chunks.append(pcm_frame_to_u8(frame.to_ndarray(), nch))
        if not chunks:
            return np.empty(0, np.uint8)
        return np.concatenate(chunks).astype(np.uint8)

    for fmt in ("mp4", "webm", "mkv"):
        register_video_decoder(fmt, _av_video)
    for fmt in ("flac", "ogg", "mp3", "wav"):
        register_audio_decoder(fmt, _av_audio)
    return True


def get_video_decoder(fmt: str):
    """Registered real-codec video decoder for ``fmt`` or None (caller
    falls back to its deterministic container or raises)."""
    if fmt not in _VIDEO_DECODERS:
        autoload_av_adapters()
    return _VIDEO_DECODERS.get(fmt)


def get_audio_decoder(fmt: str):
    if fmt not in _AUDIO_DECODERS:
        autoload_av_adapters()
    return _AUDIO_DECODERS.get(fmt)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        raise ValueError("shape mismatch")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def average_phash(pixels: np.ndarray, grid: int = 8) -> int:
    """Mean-threshold perceptual hash over a grid x grid downsample of the
    grayscale image -> signed int64 (fits the table's ``phash:int64``)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    if h % grid == 0 and w % grid == 0:  # fast path: exact block means
        cells = gray.reshape(grid, h // grid, grid, w // grid).mean(axis=(1, 3))
    else:
        ys = (np.arange(grid + 1) * h // grid).astype(int)
        xs = (np.arange(grid + 1) * w // grid).astype(int)
        cells = np.empty((grid, grid))
        for i in range(grid):
            for j in range(grid):
                cells[i, j] = gray[
                    ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)
                ].mean()
    bits = (cells > cells.mean()).astype(np.uint8).reshape(-1)
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)


def average_phash_stack(frames: np.ndarray, grid: int = 8) -> np.ndarray:
    """Vectorized :func:`average_phash` over a stack of same-size GRAYSCALE
    frames ``(n, h, w) uint8`` -> ``int64[n]``.

    Bit-identical to ``average_phash(frame[:, :, None])`` per frame: the
    uint8 -> float64 block means are exact (integer sums below 2**53,
    divisors h//grid * w//grid and grid*grid), so vectorizing the reduction
    cannot change any threshold comparison. Frames whose shape doesn't tile
    the grid fall back to the scalar kernel (exactness over speed)."""
    n, h, w = frames.shape
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if grid != 8 or h % grid or w % grid:
        return np.fromiter(
            (average_phash(f[:, :, None], grid) for f in frames),
            dtype=np.int64,
            count=n,
        )
    return average_phash_gray_stack(frames.astype(np.float64), grid)


def average_phash_gray_stack(gray: np.ndarray, grid: int = 8) -> np.ndarray:
    """The shared mean-threshold hash kernel over a FLOAT64 grayscale
    stack ``(n, h, w)`` with ``h % grid == 0 and w % grid == 0`` ->
    ``int64[n]`` — the single home of the delicate cells->bits->packbits
    bit layout (``average_phash_stack`` and the tile-hash stage both
    reduce to it, so the bit parity cannot fork between frame and tile
    hashes)."""
    n, h, w = gray.shape
    if n == 0:
        return np.empty(0, dtype=np.int64)
    cells = gray.reshape(n, grid, h // grid, grid, w // grid).mean(axis=(2, 4))
    bits = (cells > cells.mean(axis=(1, 2), keepdims=True)).astype(np.uint8)
    packed = np.packbits(bits.reshape(n, grid * grid), axis=1)
    return packed.view(">i8").astype(np.int64).reshape(n)
