"""Straight-line single-process reimplementation of the REFERENCE algorithm
semantics (text-dedup), used as the parity oracle for the Ray pipelines.

Mirrors the reference flow literally — per-doc loops, bucket dicts, pair
enumeration — including its quirks:
- MinHash: bucket by (band_idx, band bytes); ALL bucket pairs union; parents
  map every multi-bucket member (incl. roots) to the component min
  (minhash.py:48-79).
- SimHash: bucket key is (search_mask bytes, masked permuted sig) — NOT
  (perm_idx, ...) — so buckets merge across permutations sharing a search
  mask, exactly like the reference's tuple key (simhash.py:46-68); a pair
  unions only if hamming <= bit_diff; parents keep non-root members only.

Only shared *kernel primitives* (shingles, base hash, permutation tables)
come from the library; the clustering flow here is independent of the Ray
stages under test.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from text_dedup_ray.functions.minhash import HASH_CONFIG, MinHashConfig
from text_dedup_ray.functions.simhash import SimHashConfig, create_permutations
from text_dedup_ray.functions.tokenization import shingle_set, token_count
from text_dedup_ray.functions.unionfind import UnionFind


def minhash_reference_parents(
    texts: list[str], ids: list[int], cfg: MinHashConfig
) -> dict[int, int]:
    """Reference cluster map (member -> component min, incl. root->root)."""
    dtype, max_hash, prime = HASH_CONFIG[cfg.hash_bits]
    max_hash = dtype(max_hash)
    prime = dtype(prime)
    a, b = cfg.permutations()
    hf = cfg.base_hash()
    buckets: dict[tuple[int, bytes], list[int]] = defaultdict(list)
    for text, idx in zip(texts, ids):
        if token_count(text) < cfg.min_length:
            continue  # min-length filter (minhash.py:201-204)
        shingles = shingle_set(text, cfg.ngram_size, cfg.min_length)
        hv = np.array([hf(s) for s in shingles], dtype=dtype).reshape(len(shingles), 1)
        with np.errstate(over="ignore"):
            phv = (hv * a + b) % prime & max_hash
        sig = np.vstack([phv, np.full((1, cfg.num_perm), max_hash, dtype=dtype)]).min(axis=0)
        for band_idx, (s, e) in enumerate(cfg.hash_ranges):
            buckets[(band_idx, bytes(sig[s:e].byteswap().data))].append(idx)

    uf = UnionFind()
    seen: set[int] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        seen.update(members)
        for i in range(1, len(members)):
            uf.union(members[0], members[i])
    return {m: uf.find(m) for m in seen}


def simhash_reference_parents(
    texts: list[str], ids: list[int], cfg: SimHashConfig
) -> dict[int, int]:
    """Reference cluster map (non-root members only)."""
    perms = create_permutations(cfg.f, cfg.bit_diff, cfg.num_bucket)
    hf = cfg.base_hash()
    sigs: dict[int, int] = {}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    uf = UnionFind()
    for text, idx in zip(texts, ids):
        shingles = shingle_set(text, cfg.ngram_size, cfg.min_length)
        if shingles:
            from text_dedup_ray.functions.simhash import compute_majority

            sig = compute_majority([hf(s) for s in shingles], cfg.f)
        else:
            sig = 0
        sigs[idx] = sig
        for p in perms:
            key = (p.search_mask, p.key(sig))  # reference's (mask, value) tuple
            for other in buckets[key]:
                if other == idx:
                    continue
                if bin(sig ^ sigs[other]).count("1") <= cfg.bit_diff:
                    uf.union(idx, other)
            buckets[key].append(idx)
    return uf.non_trivial_clusters()


def dup_pairs(parents: dict[int, int]) -> set[tuple[int, int]]:
    """Same-cluster pairs — the id-convention-agnostic comparison unit."""
    groups: dict[int, list[int]] = defaultdict(list)
    for member, root in parents.items():
        groups[root].append(member)
        groups[root].append(root)
    pairs: set[tuple[int, int]] = set()
    for members in groups.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs
