"""Base hash functions (reference parity: src/text_dedup/utils/hashfunc.py:63-105).

The reference defaults to xxh3 (not installed in this environment) with sha1 as
a config option. We keep the same interface; ``xxh3`` is used when the
``xxhash`` wheel is importable, otherwise callers should pick ``sha1``.

Parity notes:
- ``sha1_hash(data, 32)`` = little-endian uint32 of the first 4 digest bytes
  (reference utils/hashfunc.py:88-89).
- ``xxh3_hash(data, seed, 32)`` = ``xxh3_64 & 0xFFFFFFFF`` (hashfunc.py:99) —
  MinHash "64-bit" mode really uses 32-bit base hashes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable

try:  # optional — not in this sandbox, but the public wheel is the fast path
    import xxhash  # type: ignore

    HAS_XXHASH = True
except ImportError:  # pragma: no cover
    xxhash = None
    HAS_XXHASH = False


def sha1_hash(data: bytes, d: int = 32) -> int:
    """d-bit hash from sha1 digest, little-endian (reference hashfunc.py:63-93)."""
    digest = hashlib.sha1(data, usedforsecurity=False).digest()
    if d == 32:
        return struct.unpack("<I", digest[:4])[0]
    if d == 64:
        return struct.unpack("<Q", digest[:8])[0]
    return int.from_bytes(digest[: d // 8], byteorder="little")


def md5_hash(data: bytes, d: int = 32) -> int:
    """d-bit hash from the md5 digest, BIG-endian — chosen so a DuckDB oracle
    can reproduce it exactly as ``('0x' || substr(md5(x), 1, d/4))::UBIGINT``
    (DuckDB 1.0 has md5 but not sha1). Same interface as :func:`sha1_hash`;
    an additional config option beyond the reference's sha1/xxh3 pair
    (hash choice is already a config axis there, utils/hashfunc.py)."""
    digest = hashlib.md5(data, usedforsecurity=False).digest()
    return int.from_bytes(digest[: d // 8], byteorder="big")


def xxh3_hash(data: bytes, seed: int = 0, bits: int = 32) -> int:
    """xxh3 hash (reference hashfunc.py:96-105). Uses the ``xxhash`` wheel
    when importable; otherwise the vendored pure-python XXH3-64
    (functions/xxh3.py) for the 32/64-bit widths, so the reference's DEFAULT
    hash config runs in wheel-less environments (slower — C paths for
    production)."""
    if HAS_XXHASH:
        if bits == 32:
            return xxhash.xxh3_64_intdigest(data, seed) & 0xFFFFFFFF
        if bits == 64:
            return xxhash.xxh3_64_intdigest(data, seed)
        if bits == 128:
            return xxhash.xxh3_128_intdigest(data, seed)
        return int.from_bytes(xxhash.xxh3_128_digest(data)[: bits // 8], byteorder="big")
    from .xxh3 import xxh3_64 as _py_xxh3_64

    if bits == 32:
        return _py_xxh3_64(data, seed) & 0xFFFFFFFF
    if bits == 64:
        return _py_xxh3_64(data, seed)
    raise ImportError(
        "xxh3 widths beyond 64 bits need the xxhash wheel; use hash_func='sha1'"
    )


def make_hash_func(name: str, seed: int, bits: int) -> Callable[[bytes], int]:
    """Resolve a base-hash callable like the reference config does
    (config/algorithms/minhash.py:135-146): width is ``min(bits, 32)`` for
    MinHash; SimHash passes the full fingerprint width."""
    if name == "sha1":
        d = bits
        return lambda data: sha1_hash(data, d)
    if name == "md5":
        d = bits
        return lambda data: md5_hash(data, d)
    if name == "xxh3":
        return lambda data: xxh3_hash(data, seed=seed, bits=bits)
    raise ValueError(f"unknown hash function {name!r}")


DEFAULT_HASH = "xxh3" if HAS_XXHASH else "sha1"
