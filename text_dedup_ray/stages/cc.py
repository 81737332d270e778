"""Distributed connected components over an edge Dataset.

Replaces the reference's single-process CC (polars ``super_merger``,
minhash.py:66; pure-Python UnionFind loop, simhash.py:43-68) with a
tree-reduced union-find:

- every round, each block of edges is collapsed independently to its spanning
  star edges ``member -> component-min`` (functions/unionfind.reduce_edges) —
  a block of E edges shrinks to at most ``distinct_nodes - components`` rows;
- blocks are then coalesced ``fanin``-to-1 (``repartition`` — a cheap block
  merge, no key shuffle) and reduced again, so components that span blocks
  merge a level higher;
- when the surviving edge count fits ``driver_threshold``, the final
  union-find runs on the driver and yields the cluster map.

Roots are always component minima (order-independent, deterministic under
retries), matching the reference's min-id representative convention
(minhash.py:67-77).

Scale note: the map's final size is O(#duplicate rows). The tree reduction
keeps every intermediate step distributed; only the (narrow, int64-pair)
final map is driver-resident, which holds to ~10^8 duplicates. Beyond that,
swap the last step for iterated min-label propagation (groupby-aggregate
rounds) — the hook is ``driver_threshold``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.unionfind import UnionFind, reduce_edges


def _reduce_block(batch: pa.Table) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    s, d = reduce_edges(src, dst)
    return pa.table({"src": s, "dst": d})


def connected_components(
    edges: ray.data.Dataset,
    driver_threshold: int = 2_000_000,
    fanin: int = 8,
    max_rounds: int = 20,
) -> dict[int, int]:
    """Edge Dataset -> {member: component_min} for every node seen in an edge
    (roots map to themselves, mirroring the reference's parents dict which
    includes min->min entries, minhash.py:67-79)."""
    ds = edges
    for _ in range(max_rounds):
        ds = ds.map_batches(_reduce_block, batch_format="pyarrow", batch_size=None)
        ds = ds.materialize()
        n = ds.count()
        nblocks = ds.num_blocks()
        if n <= driver_threshold or nblocks <= 1:
            break
        ds = ds.repartition(max(1, nblocks // fanin))

    uf = UnionFind()
    for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        for s, d in zip(src.tolist(), dst.tolist()):
            uf.union(s, d)
    return uf.get_clusters()


def cluster_map_to_table(parents: dict[int, int]) -> pa.Table:
    """Cluster map as an Arrow table (row_id, cluster_id) sorted by row_id —
    the engine's replacement for the reference's clusters.pickle."""
    if not parents:
        return pa.table(
            {"row_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )
    members = np.fromiter(parents.keys(), dtype=np.int64, count=len(parents))
    roots = np.fromiter(parents.values(), dtype=np.int64, count=len(parents))
    order = np.argsort(members, kind="stable")
    return pa.table({"row_id": members[order], "cluster_id": roots[order]})
