"""Pure-python XXH3-64 (public algorithm: Cyan4973/xxHash, BSD-2).

The reference's DEFAULT base hash is ``xxh3`` (utils/hashfunc.py:96-105) but
the ``xxhash`` wheel does not exist in this environment, so round 1 left the
xxh3 code path unexecutable. This module implements XXH3_64bits(_withSeed)
from the published specification — seeded dispatch over the 0 / 1-3 / 4-8 /
9-16 / 17-128 / 129-240 / long-stripe paths, including the seeded custom
secret for long inputs — so ``hash_func="xxh3"`` runs everywhere.

Validation: the canonical empty-input digest is asserted in tests, and
``tests/test_xxh3.py`` cross-checks random inputs of every length class
against the real ``xxhash`` wheel WHEREVER that wheel exists (skipped here).
Throughput is Python-speed — fine for tests/parity, use sha1 (C) or the
wheel for production runs.
"""

from __future__ import annotations

import struct

MASK64 = (1 << 64) - 1

PRIME32_1 = 0x9E3779B1
PRIME32_2 = 0x85EBCA77
PRIME32_3 = 0xC2B2AE3D
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5
PRIME_MX1 = 0x165667919E3779F9
PRIME_MX2 = 0x9FB21C651E98DF25

# XXH3_kSecret — the default 192-byte secret from xxhash.h
KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "71644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f95160428afd7fbcabb4b407e"
)
assert len(KSECRET) == 192


def _r64(b: bytes, off: int) -> int:
    return struct.unpack_from("<Q", b, off)[0]


def _r32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _bswap32(x: int) -> int:
    return int.from_bytes((x & 0xFFFFFFFF).to_bytes(4, "little"), "big")


def _bswap64(x: int) -> int:
    return int.from_bytes(x.to_bytes(8, "little"), "big")


def _xxh64_avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME64_2) & MASK64
    h ^= h >> 29
    h = (h * PRIME64_3) & MASK64
    return h ^ (h >> 32)


def _xxh3_avalanche(h: int) -> int:
    h = (h ^ (h >> 37)) & MASK64
    h = (h * PRIME_MX1) & MASK64
    return h ^ (h >> 32)


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * PRIME_MX2) & MASK64
    h = (h ^ ((h >> 35) + length)) & MASK64
    h = (h * PRIME_MX2) & MASK64
    return h ^ (h >> 28)


def _mul128_fold64(a: int, b: int) -> int:
    p = a * b
    return (p ^ (p >> 64)) & MASK64


def _mix16(data: bytes, doff: int, secret: bytes, soff: int, seed: int) -> int:
    lo = _r64(data, doff) ^ ((_r64(secret, soff) + seed) & MASK64)
    hi = _r64(data, doff + 8) ^ ((_r64(secret, soff + 8) - seed) & MASK64)
    return _mul128_fold64(lo, hi)


def _len_0(secret: bytes, seed: int) -> int:
    return _xxh64_avalanche(seed ^ _r64(secret, 56) ^ _r64(secret, 64))


def _len_1to3(data: bytes, secret: bytes, seed: int) -> int:
    n = len(data)
    c1, c2, c3 = data[0], data[n >> 1], data[-1]
    combined = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
    bitflip = ((_r32(secret, 0) ^ _r32(secret, 4)) + seed) & MASK64
    return _xxh64_avalanche(combined ^ bitflip)


def _len_4to8(data: bytes, secret: bytes, seed: int) -> int:
    n = len(data)
    seed ^= _bswap32(seed & 0xFFFFFFFF) << 32
    in1 = _r32(data, 0)
    in2 = _r32(data, n - 4)
    bitflip = ((_r64(secret, 8) ^ _r64(secret, 16)) - seed) & MASK64
    input64 = in2 | (in1 << 32)
    return _rrmxmx(input64 ^ bitflip, n)


def _len_9to16(data: bytes, secret: bytes, seed: int) -> int:
    n = len(data)
    bitflip1 = ((_r64(secret, 24) ^ _r64(secret, 32)) + seed) & MASK64
    bitflip2 = ((_r64(secret, 40) ^ _r64(secret, 48)) - seed) & MASK64
    in_lo = _r64(data, 0) ^ bitflip1
    in_hi = _r64(data, n - 8) ^ bitflip2
    acc = (n + _bswap64(in_lo) + in_hi + _mul128_fold64(in_lo, in_hi)) & MASK64
    return _xxh3_avalanche(acc)


def _len_17to128(data: bytes, secret: bytes, seed: int) -> int:
    n = len(data)
    acc = (n * PRIME64_1) & MASK64
    if n > 32:
        if n > 64:
            if n > 96:
                acc = (acc + _mix16(data, 48, secret, 96, seed)) & MASK64
                acc = (acc + _mix16(data, n - 64, secret, 112, seed)) & MASK64
            acc = (acc + _mix16(data, 32, secret, 64, seed)) & MASK64
            acc = (acc + _mix16(data, n - 48, secret, 80, seed)) & MASK64
        acc = (acc + _mix16(data, 16, secret, 32, seed)) & MASK64
        acc = (acc + _mix16(data, n - 32, secret, 48, seed)) & MASK64
    acc = (acc + _mix16(data, 0, secret, 0, seed)) & MASK64
    acc = (acc + _mix16(data, n - 16, secret, 16, seed)) & MASK64
    return _xxh3_avalanche(acc)


_MIDSIZE_STARTOFFSET = 3
_MIDSIZE_LASTOFFSET = 17


def _len_129to240(data: bytes, secret: bytes, seed: int) -> int:
    n = len(data)
    acc = (n * PRIME64_1) & MASK64
    for i in range(8):
        acc = (acc + _mix16(data, 16 * i, secret, 16 * i, seed)) & MASK64
    acc = _xxh3_avalanche(acc)
    nb_rounds = n // 16
    for i in range(8, nb_rounds):
        acc = (
            acc + _mix16(data, 16 * i, secret, 16 * (i - 8) + _MIDSIZE_STARTOFFSET, seed)
        ) & MASK64
    acc = (acc + _mix16(data, n - 16, secret, 136 - _MIDSIZE_LASTOFFSET, seed)) & MASK64
    return _xxh3_avalanche(acc)


_SECRET_LASTACC_START = 7
_SECRET_MERGEACCS_START = 11
_INIT_ACC = (
    PRIME32_3, PRIME64_1, PRIME64_2, PRIME64_3,
    PRIME64_4, PRIME32_2, PRIME64_5, PRIME32_1,
)


def _accumulate_512(acc: list[int], data: bytes, doff: int, secret: bytes, soff: int) -> None:
    for i in range(8):
        data_val = _r64(data, doff + 8 * i)
        data_key = data_val ^ _r64(secret, soff + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + data_val) & MASK64
        acc[i] = (acc[i] + (data_key & 0xFFFFFFFF) * (data_key >> 32)) & MASK64


def _scramble(acc: list[int], secret: bytes) -> None:
    soff = len(secret) - 64
    for i in range(8):
        a = acc[i]
        a ^= a >> 47
        a ^= _r64(secret, soff + 8 * i)
        acc[i] = (a * PRIME32_1) & MASK64


def _hash_long(data: bytes, secret: bytes) -> int:
    n = len(data)
    nb_stripes_per_block = (len(secret) - 64) // 8
    block_len = 64 * nb_stripes_per_block
    nb_blocks = (n - 1) // block_len
    acc = list(_INIT_ACC)
    for b in range(nb_blocks):
        for s in range(nb_stripes_per_block):
            _accumulate_512(acc, data, b * block_len + 64 * s, secret, 8 * s)
        _scramble(acc, secret)
    nb_stripes = ((n - 1) - block_len * nb_blocks) // 64
    for s in range(nb_stripes):
        _accumulate_512(acc, data, nb_blocks * block_len + 64 * s, secret, 8 * s)
    _accumulate_512(acc, data, n - 64, secret, len(secret) - 64 - _SECRET_LASTACC_START)
    # merge
    result = (n * PRIME64_1) & MASK64
    for i in range(4):
        result = (
            result
            + _mul128_fold64(
                acc[2 * i] ^ _r64(secret, _SECRET_MERGEACCS_START + 16 * i),
                acc[2 * i + 1] ^ _r64(secret, _SECRET_MERGEACCS_START + 16 * i + 8),
            )
        ) & MASK64
    return _xxh3_avalanche(result)


def _custom_secret(seed: int) -> bytes:
    out = bytearray(192)
    for i in range(12):
        struct.pack_into("<Q", out, 16 * i, (_r64(KSECRET, 16 * i) + seed) & MASK64)
        struct.pack_into("<Q", out, 16 * i + 8, (_r64(KSECRET, 16 * i + 8) - seed) & MASK64)
    return bytes(out)


def xxh3_64(data: bytes, seed: int = 0) -> int:
    """XXH3_64bits_withSeed(data, seed)."""
    seed &= MASK64
    n = len(data)
    if n == 0:
        return _len_0(KSECRET, seed)
    if n <= 3:
        return _len_1to3(data, KSECRET, seed)
    if n <= 8:
        return _len_4to8(data, KSECRET, seed)
    if n <= 16:
        return _len_9to16(data, KSECRET, seed)
    if n <= 128:
        return _len_17to128(data, KSECRET, seed)
    if n <= 240:
        return _len_129to240(data, KSECRET, seed)
    return _hash_long(data, _custom_secret(seed) if seed else KSECRET)
