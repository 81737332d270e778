"""Suffix-array construction + duplicate-range detection (pure numpy).

The reference shells out to the google-research/deduplicate-text-datasets
Rust tool over the whole corpus (suffix_array.py:58-75; the submodule is not
even checked out). Here the suffix array is built in-process with the
Manber–Myers prefix-doubling algorithm, fully vectorized:

- ranks double each round via a single ``np.argsort`` over a combined
  ``rank * (n+1) + next_rank`` int64 key (valid while n < 2^31 — per-partition
  corpora are MBs, far below);
- LCPs of SA-adjacent suffixes come from a chunked vectorized byte compare
  (work proportional to total matched bytes, like Kasai, but numpy);
- a byte position is duplicated iff an SA-adjacent pair shares a prefix
  >= length_threshold; both sides of each such pair are marked, so every
  occurrence of every repeated run >= L is covered (the google tool's
  ``self-similar`` semantics).
"""

from __future__ import annotations

import numpy as np

from .intervals import Interval, merge_intervals


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 array via prefix doubling. O(n log^2 n)."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = data.astype(np.int64)
    k = 1
    idx = np.arange(n, dtype=np.int64)
    while True:
        next_rank = np.full(n, -1, dtype=np.int64)
        next_rank[: n - k] = rank[k:]
        # multiplier must exceed the current rank radix (raw bytes on round 1)
        radix = np.int64(max(int(rank.max()), int(next_rank.max())) + 2)
        key = rank * radix + (next_rank + 1)
        order = np.argsort(key, kind="stable")
        sorted_key = key[order]
        new_rank = np.empty(n, dtype=np.int64)
        boundaries = np.r_[0, np.cumsum((np.diff(sorted_key) != 0).astype(np.int64))]
        new_rank[order] = boundaries
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct
            return order
        k *= 2
        if k >= n:
            return np.argsort(rank, kind="stable").astype(np.int64)
    return idx  # unreachable


def adjacent_lcp(data: np.ndarray, sa: np.ndarray, chunk: int = 64) -> np.ndarray:
    """LCP between each SA-adjacent suffix pair, exact, chunked-vectorized."""
    n = len(data)
    m = len(sa) - 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    a = sa[:-1].astype(np.int64)
    b = sa[1:].astype(np.int64)
    lcp = np.zeros(m, dtype=np.int64)
    active = np.arange(m)
    while len(active):
        off = lcp[active]
        pos_a = a[active][:, None] + off[:, None] + np.arange(chunk)
        pos_b = b[active][:, None] + off[:, None] + np.arange(chunk)
        valid = (pos_a < n) & (pos_b < n)
        va = data[np.minimum(pos_a, n - 1)]
        vb = data[np.minimum(pos_b, n - 1)]
        eq = (va == vb) & valid
        # matched prefix length within this chunk per pair
        matched = np.where(eq.all(axis=1), chunk, eq.argmin(axis=1))
        lcp[active] += matched
        # pairs that matched the full chunk AND can still extend stay active
        still = (matched == chunk) & (
            (a[active] + lcp[active] < n) & (b[active] + lcp[active] < n)
        )
        active = active[still]
    return lcp


def minimizer_hashes(data: np.ndarray, k: int = 16, window: int | None = None,
                     length_threshold: int = 100) -> np.ndarray:
    """Winnowing minimizer fingerprints (Schleimer et al., SIGMOD'03).

    Rolling k-gram hashes; per sliding window of ``window`` consecutive
    grams, keep the minimum. Guarantee: two byte strings sharing a verbatim
    run of length >= window + k - 1 share at least one minimizer REGARDLESS
    of alignment — the content-defined anchor that lets cross-partition
    suffix-array dedup co-locate candidate documents. Default window is
    ``length_threshold - k + 1`` so the guarantee kicks in exactly at the
    dedup threshold.
    """
    n = len(data)
    if window is None:
        window = max(1, length_threshold - k + 1)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    arr = data.astype(np.uint64)
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        pows = base ** np.arange(k, dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(arr, k)
        grams = (windows * pows[::-1]).sum(axis=1, dtype=np.uint64)
    if len(grams) <= window:
        return np.unique(grams.min(keepdims=True))
    w = np.lib.stride_tricks.sliding_window_view(grams, window)
    return np.unique(w.min(axis=1))


def duplicate_byte_ranges(data: np.ndarray, length_threshold: int) -> list[Interval]:
    """Merged [start, stop) ranges covered by some repeat >= length_threshold."""
    n = len(data)
    if n < 2 * length_threshold:
        # a repeat needs two disjoint-or-overlapping occurrences; tiny inputs
        # can still repeat, so only skip the trivial empty case
        if n < length_threshold + 1:
            return []
    sa = suffix_array(data)
    lcp = adjacent_lcp(data, sa)
    hits = np.flatnonzero(lcp >= length_threshold)
    if len(hits) == 0:
        return []
    starts = np.concatenate([sa[hits], sa[hits + 1]])
    lengths = np.concatenate([lcp[hits], lcp[hits]])
    intervals = list(zip(starts.tolist(), (starts + lengths).tolist()))
    return merge_intervals(intervals, "overlapping")
