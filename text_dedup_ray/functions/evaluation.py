"""Dedup-quality evaluation metrics (reference parity: benchmarks/utils.py
and benchmarks/benchmark_core.py / benchmark_news.py).

The reference grades against labeled duplicate sets with pairwise
precision/recall/F1/accuracy and (NEWS-COPY) the Adjusted Rand Index. Here
the same math works over cluster maps {member: root} — robust to differing
cluster-id conventions because everything reduces to same-cluster pairs.
"""

from __future__ import annotations

from collections import defaultdict


def clusters_to_pairs(parents: dict[int, int], include_roots: bool = True) -> set[tuple[int, int]]:
    groups: dict[int, set[int]] = defaultdict(set)
    for m, r in parents.items():
        groups[r].add(m)
        if include_roots:
            groups[r].add(r)
    pairs: set[tuple[int, int]] = set()
    for members in groups.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def pair_metrics(
    predicted: set[tuple[int, int]], truth: set[tuple[int, int]]
) -> dict[str, float]:
    tp = len(predicted & truth)
    fp = len(predicted - truth)
    fn = len(truth - predicted)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


def adjusted_rand_index(labels_a: list[int], labels_b: list[int]) -> float:
    """ARI between two clusterings over the same elements (pure python;
    the reference uses sklearn — not installed here)."""
    if len(labels_a) != len(labels_b):
        raise ValueError("length mismatch")
    n = len(labels_a)
    if n == 0:
        return 1.0
    cont: dict[tuple[int, int], int] = defaultdict(int)
    a_count: dict[int, int] = defaultdict(int)
    b_count: dict[int, int] = defaultdict(int)
    for x, y in zip(labels_a, labels_b):
        cont[(x, y)] += 1
        a_count[x] += 1
        b_count[y] += 1

    def c2(v: int) -> int:
        return v * (v - 1) // 2

    sum_comb = sum(c2(v) for v in cont.values())
    sum_a = sum(c2(v) for v in a_count.values())
    sum_b = sum(c2(v) for v in b_count.values())
    total = c2(n)
    expected = sum_a * sum_b / total if total else 0.0
    max_index = (sum_a + sum_b) / 2
    if max_index == expected:
        return 1.0
    return (sum_comb - expected) / (max_index - expected)


def dup_pair_recall(
    predicted_parents: dict[int, int], truth_clusters: dict[int, int]
) -> float:
    """Recall of truth same-cluster pairs by the predicted cluster map —
    the BASELINE's headline correctness metric."""
    truth_groups: dict[int, list[int]] = defaultdict(list)
    for member, cid in truth_clusters.items():
        truth_groups[cid].append(member)
    truth_pairs = set()
    for members in truth_groups.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                truth_pairs.add((ms[i], ms[j]))
    if not truth_pairs:
        return 1.0
    predicted = clusters_to_pairs(predicted_parents)
    return len(predicted & truth_pairs) / len(truth_pairs)
