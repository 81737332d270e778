"""Distributed k-means over an embedding column.

Two pieces a 100-TB curation pipeline needs:

- ``kmeans_assign`` — nearest-centroid assignment as a single streaming
  ``map_batches`` pass: the (k x d) centroid matrix is ``ray.put`` ONCE
  and read from the local object store by every task (never re-shipped
  per batch); distances are one vectorized matmul per batch. This is the
  primitive behind topic bucketing, cluster-balanced sampling, and the
  SemDeDup cell step (``pipelines/semdedup.py`` uses caller-provided
  centroids through the same geometry).

- ``kmeans_fit`` — full-corpus Lloyd iterations (the scale path when the
  driver-sample trainer ``pipelines/ann.py:spherical_kmeans`` isn't
  representative enough): each iteration is ONE streaming pass that
  reduces every block to at most k ``(cell, sum-vector, count)`` partial
  rows (``np.add.at`` over the stacked block matrix), a cell-hash
  exchange folds partials to exactly k rows, and only those k tiny rows
  ever reach the driver. Per-iteration data movement is O(blocks x k x d)
  partials — independent of corpus row count. Empty cells keep their
  previous centroid (deterministic). Init is either caller-provided
  (``init=``, e.g. a ``spherical_kmeans`` sample fit) or a seeded
  unit-normalized gaussian draw — data-independent and reproducible
  across runs, partitionings and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import hash_partition_exchange


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _resolve(ref_or_arr) -> np.ndarray:
    if isinstance(ref_or_arr, ray.ObjectRef):
        return ray.get(ref_or_arr)
    return ref_or_arr


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    vector_column: str = "embedding",
    metric: str = "l2",
    cell_alias: str = "cell",
    dist_alias: str | None = None,
    round_to: int = 6,
    drop_vector: bool = False,
) -> ray.data.Dataset:
    """Append the argmin-``metric`` centroid index (ties -> smallest
    index, matching SQL ``row_number ... ORDER BY dist, cid``); optional
    rounded distance column. ``metric``: ``l2`` or ``cosine`` (distance
    = 1 - dot; pass normalized vectors for true cosine)."""
    cents = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    cents_ref = ray.put(cents)
    sq = (cents**2).sum(axis=1)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        c = _resolve(cents_ref)
        m = _as_matrix(batch[vector_column])
        dots = m @ c.T
        if metric == "l2":
            d2 = (m**2).sum(axis=1)[:, None] - 2.0 * dots + sq[None, :]
            dist = np.sqrt(np.maximum(d2, 0.0))
        elif metric == "cosine":
            dist = 1.0 - dots
        else:  # pragma: no cover
            raise ValueError(f"unknown metric {metric!r}")
        cell = np.argmin(dist, axis=1).astype(np.int64)
        out = batch
        if drop_vector:
            out = out.drop_columns([vector_column])
        out = out.append_column(cell_alias, pa.array(cell))
        if dist_alias is not None:
            best = np.round(dist[np.arange(len(cell)), cell], round_to)
            out = out.append_column(dist_alias, pa.array(best))
        return out

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int,
    vector_column: str = "embedding",
    iters: int = 10,
    seed: int = 42,
    metric: str = "l2",
    init: np.ndarray | None = None,
    num_partitions: int = 8,
    dim: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Full-corpus Lloyd's; returns ``(centroids (k,d) float64, counts
    (k,) int64)`` for the final assignment. Every iteration streams the
    corpus once; only k folded rows reach the driver."""
    if init is not None:
        cents = np.asarray(init, dtype=np.float64).copy()
        k = len(cents)
    else:
        if dim is None:
            first = ds.take(1)
            if not first:
                raise ValueError("kmeans_fit on an empty dataset needs dim=")
            dim = len(first[0][vector_column])
        rng = np.random.default_rng(seed)
        cents = rng.standard_normal((k, dim))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    counts = np.zeros(k, dtype=np.int64)
    for _ in range(max(iters, 1)):
        cents_ref = ray.put(np.ascontiguousarray(cents))
        sq = (cents**2).sum(axis=1)

        def partial(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0:
                return empty
            c = _resolve(cents_ref)
            m = _as_matrix(batch[vector_column])
            dots = m @ c.T
            if metric == "l2":
                score = (m**2).sum(axis=1)[:, None] - 2.0 * dots + sq[None, :]
            else:
                score = -dots
            cell = np.argmin(score, axis=1)
            uniq = np.unique(cell)
            sums = np.zeros((len(c), m.shape[1]), np.float64)
            np.add.at(sums, cell, m)
            n = np.bincount(cell, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "cell": pa.array(uniq.astype(np.int64)),
                    "vsum": pa.array([sums[u].tolist() for u in uniq]),
                    "n": pa.array(n[uniq]),
                    "part": pa.array(uniq.astype(np.int64) % num_partitions),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64()),
                }
            )
            if group.num_rows == 0 or "cell" not in group.column_names:
                return empty
            cell = group["cell"].to_numpy(zero_copy_only=False)
            sums = np.array(group["vsum"].to_pylist(), dtype=np.float64)
            ns = group["n"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(cell, return_inverse=True)
            tot = np.zeros((len(uniq), sums.shape[1]), np.float64)
            np.add.at(tot, inv, sums)
            cnt = np.zeros(len(uniq), np.int64)
            np.add.at(cnt, inv, ns)
            return pa.table(
                {
                    "cell": pa.array(uniq.astype(np.int64)),
                    "vsum": pa.array([r.tolist() for r in tot]),
                    "n": pa.array(cnt),
                }
            )

        folded = hash_partition_exchange(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            "part",
            num_partitions,
            fold,
        ).take_all()  # at most k tiny rows
        counts = np.zeros(k, dtype=np.int64)
        new = cents.copy()  # empty cells keep their previous centroid
        for row in folded:
            c = int(row["cell"])
            counts[c] = int(row["n"])
            new[c] = np.asarray(row["vsum"], dtype=np.float64) / counts[c]
        if metric == "cosine":
            nz = counts > 0
            norms = np.linalg.norm(new[nz], axis=1, keepdims=True)
            new[nz] = new[nz] / np.maximum(norms, 1e-12)
        cents = new
    return cents, counts
