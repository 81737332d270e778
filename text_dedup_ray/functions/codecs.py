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


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt in ("jpeg", "fjpg"):
        return encode_fjpg(pixels)
    raise NotImplementedError(f"codec {fmt!r} not available in this environment")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "fjpg"):
        return decode_fjpg(data)
    raise NotImplementedError(f"codec {fmt!r} not available in this environment")


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
