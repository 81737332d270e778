"""Byte-interval utilities for exact-substring dedup.

Semantics replicated from the reference
(``config/algorithms/suffix_array.py:20-290``): interval dedup + sort by
``(start, -stop)``; "longest" keeps any interval extending past the previous
stop (only drops contained ones); "overlapping" coalesces touching intervals;
``restore`` maps global corpus byte slices back to per-document local slices,
splitting ranges that straddle document boundaries; ``clean_up`` cuts byte
ranges and decodes with ``errors="ignore"``.

Intervals are plain ``(start, stop)`` int tuples (not ``slice`` objects) so
they can live in Arrow list columns.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Generator, Iterable

Interval = tuple[int, int]


def merge_intervals(
    intervals: Iterable[Interval], merge_strategy: str = "longest"
) -> list[Interval]:
    uniq = sorted(set((s, e) for s, e in intervals), key=lambda x: (x[0], -x[1]))
    merged: list[Interval] = []
    for cur in uniq:
        if not merged:
            merged.append(cur)
            continue
        prev = merged[-1]
        if merge_strategy == "overlapping":
            if prev[1] >= cur[0]:
                merged[-1] = (prev[0], max(prev[1], cur[1]))
            else:
                merged.append(cur)
        elif merge_strategy == "longest":
            if cur[1] <= prev[1]:  # contained -> drop
                continue
            merged.append(cur)
        else:
            raise ValueError(f"unknown merge strategy {merge_strategy!r}")
    return merged


def restore(
    boundaries: list[Interval], segments: list[Interval]
) -> Generator[tuple[int, Interval], None, None]:
    """Map global byte ranges to (doc_index, local_range).

    ``boundaries`` are per-doc [start, stop) corpus offsets in order;
    ``segments`` are sorted global duplicate ranges. Mirrors the reference's
    deque walk (suffix_array.py:115-188) including the boundary-straddling
    splits.
    """
    indices: deque[Interval] = deque(segments)
    for i, (b_start, b_stop) in enumerate(boundaries):
        while indices:
            x, y = indices.popleft()
            while y <= b_start and indices:
                x, y = indices.popleft()
            if y <= b_start:
                break
            if x >= b_stop:
                indices.appendleft((x, y))
                break
            if b_start <= x < b_stop <= y:
                yield i, (x - b_start, b_stop - b_start)
                if y > b_stop:
                    indices.appendleft((b_stop, y))
                break
            elif b_start <= x < y <= b_stop:
                yield i, (x - b_start, y - b_start)
                continue
            elif x < b_start < y <= b_stop:
                yield i, (0, y - b_start)
                continue
            elif x < b_start < b_stop <= y:
                yield i, (0, b_stop - b_start)
                if y > b_stop:
                    indices.appendleft((b_stop, y))
                break


def restore_and_merge(
    boundaries: list[Interval],
    segments: list[Interval],
    k: int,
    merge_strategy: str = "longest",
) -> tuple[list[list[Interval]], int]:
    """Per-doc duplicate ranges >= k bytes, merged; plus total duplicate size
    (suffix_array.py:190-241)."""
    results: list[list[Interval]] = [[] for _ in boundaries]
    for idx, (s, e) in restore(boundaries, segments):
        if e - s >= k:
            results[idx].append((s, e))
    duplicate_size = 0
    for i in range(len(results)):
        results[i] = merge_intervals(results[i], merge_strategy)
        duplicate_size += sum(e - s for s, e in results[i])
    return results, duplicate_size


def clean_up(text: str, slices: list[Interval]) -> str:
    """Cut byte ranges out of the UTF-8 encoding; decode errors='ignore'
    (suffix_array.py:260-290)."""
    data = text.encode("utf-8")
    out = bytearray()
    start = 0
    for s, e in slices:
        out.extend(data[start:s])
        start = e
    out.extend(data[start:])
    return out.decode("utf-8", errors="ignore")
