"""Union-find with deterministic min-id roots.

The reference ships a rank-based union-find (utils/union_find.py:6-81) whose
roots are arbitrary; its MinHash pipeline separately remaps every component to
its minimum member id (minhash.py:67-77). We fold the two together:
``union by minimum id`` makes the root of every component its smallest member,
which (a) matches the reference's published cluster-representative convention
and (b) is order-independent — essential for a distributed reduction whose
input edge order depends on task scheduling.

Also provides the vectorized building block used by the distributed
connected-components stage (stages/cc.py): ``reduce_edges`` collapses an edge
array to its spanning star (node -> component-min) edges.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    """Path-compressing union-find; root is always the minimum member id."""

    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, x: int, y: int) -> None:
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if rx < ry:
            self.parent[ry] = rx
        else:
            self.parent[rx] = ry

    def get_clusters(self) -> dict[int, int]:
        return {x: self.find(x) for x in self.parent}

    def non_trivial_clusters(self) -> dict[int, int]:
        """Only members whose root differs from themselves (the duplicate map)."""
        return {x: r for x in self.parent if (r := self.find(x)) != x}


def reduce_edges(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Collapse an edge list to star edges (member -> component min) of the
    components *within this edge set*.

    Output has one edge per non-root member, so a block of E edges reduces to
    at most ``distinct_nodes - n_components`` edges — the contraction step of
    the tree-reduced distributed CC.
    """
    uf = UnionFind()
    union = uf.union
    for s, d in zip(src.tolist(), dst.tolist()):
        union(s, d)
    pairs = [(x, r) for x in uf.parent if (r := uf.find(x)) != x]
    if not pairs:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    arr = np.asarray(pairs, dtype=np.int64)
    return arr[:, 0], arr[:, 1]
