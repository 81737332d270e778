"""Distributed embedding covariance + PCA — the embedding-analytics step
(drift detection, whitening, dimension reduction before clustering/ANN).

Scale shape: every block reduces to ONE (sum-vector d, outer-product-sum
d x d, count) partial row — movement is O(blocks x d^2) regardless of row
count; the fold sums partials and only the d x d moment matrix reaches
the driver. The eigendecomposition runs on the driver over that tiny
matrix (d x d, never rows), and projection is one broadcast matmul per
batch — the same centroid-broadcast pattern as ``kmeans_assign``.

The covariance is derived as ``E[xy] - E[x]E[y]`` with the same
expression the SQL oracle uses, so after rounding the long-format
``(i, j, cov)`` table hash-compares against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import tree_fold


def _moment_partials(ds: ray.data.Dataset, vector_column: str) -> tuple:
    """(sum d, outer-sum d x d, n) folded across all blocks."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s": pa.array([], pa.list_(pa.float64())),
                "ss": pa.array([], pa.list_(pa.float64())),
                "n": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        m = np.array(batch[vector_column].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "s": pa.array([m.sum(axis=0).tolist()]),
                "ss": pa.array([(m.T @ m).reshape(-1).tolist()]),
                "n": pa.array([m.shape[0]], pa.int64()),
                "part": pa.array([0], pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        # associative moment-sum: one (s, ss, n) partial row out per tree
        # level, same schema as the map-side partials (incl. "part")
        if group.num_rows == 0 or "s" not in group.column_names:
            return pa.table(
                {
                    "s": pa.array([], pa.list_(pa.float64())),
                    "ss": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        s = np.array(group["s"].to_pylist(), dtype=np.float64).sum(axis=0)
        ss = np.array(group["ss"].to_pylist(), dtype=np.float64).sum(axis=0)
        n = int(group["n"].to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "s": pa.array([s.tolist()]),
                "ss": pa.array([ss.tolist()]),
                "n": pa.array([n], pa.int64()),
                "part": pa.array([0], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "s" not in group.column_names:
            return pa.table(
                {
                    "s": pa.array([], pa.list_(pa.float64())),
                    "ss": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        s = np.array(group["s"].to_pylist(), dtype=np.float64).sum(axis=0)
        ss = np.array(group["ss"].to_pylist(), dtype=np.float64).sum(axis=0)
        n = int(group["n"].to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "s": pa.array([s.tolist()]),
                "ss": pa.array([ss.tolist()]),
                "n": pa.array([n], pa.int64()),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    rows = tree_fold(pre, combine, fold).take_all()
    if not rows:
        return None, None, 0
    r = rows[0]
    s = np.asarray(r["s"], dtype=np.float64)
    d = len(s)
    ss = np.asarray(r["ss"], dtype=np.float64).reshape(d, d)
    return s, ss, int(r["n"])


def embedding_covariance(
    ds: ray.data.Dataset,
    vector_column: str = "embedding",
    round_to: int = 6,
) -> pa.Table:
    """Exact population covariance of a ``list<float>`` column in LONG
    format ``(i, j, cov)`` with ``cov = round(E[xi*xj] - E[xi]E[xj],
    round_to)`` — the same expression as the SQL oracle."""
    s, ss, n = _moment_partials(ds, vector_column)
    if n == 0:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "cov": pa.array([], pa.float64()),
            }
        )
    d = len(s)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    ii = np.repeat(np.arange(d, dtype=np.int64), d)
    jj = np.tile(np.arange(d, dtype=np.int64), d)
    return pa.table(
        {
            "i": pa.array(ii),
            "j": pa.array(jj),
            "cov": pa.array(np.round(cov.reshape(-1), round_to)),
        }
    )


def embedding_outliers(
    ds: ray.data.Dataset,
    vector_column: str = "embedding",
    id_column: str = "vec_id",
    z_threshold: float = 2.0,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Centroid-distance outlier detection over an embedding column — the
    pre-training anomaly sweep (mislabeled / corrupted / off-distribution
    vectors). Three narrow passes, nothing row-sized on the driver:

    1. the shared moment fold gives the global centroid (d doubles);
    2. one stateless pass folds per-block (sum, sum-of-squares, n) of the
       squared centroid distance to driver SCALARS;
    3. one stamp pass emits ``dist2`` (rounded) and ``is_outlier =
       round(dist2) > round(mean + z*std)`` — the comparison runs on
       ROUNDED values in both this op and the SQL oracle, so cross-engine
       ulp noise cannot flip a flag off-boundary."""
    s, ss, n = _moment_partials(ds, vector_column)
    empty = pa.table(
        {
            id_column: pa.array([], pa.int64()),
            "dist2": pa.array([], pa.float64()),
            "is_outlier": pa.array([], pa.bool_()),
        }
    )
    if n == 0:
        return ray.data.from_arrow(empty)
    mean = s / n
    mean_ref = ray.put(mean)

    def d2_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "sd": pa.array([], pa.float64()),
                    "sd2": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        mu = ray.get(mean_ref) if isinstance(mean_ref, ray.ObjectRef) else mean_ref
        m = np.array(batch[vector_column].to_pylist(), dtype=np.float64)
        d2 = ((m - mu) ** 2).sum(axis=1)
        return pa.table(
            {
                "sd": pa.array([float(d2.sum())]),
                "sd2": pa.array([float((d2 * d2).sum())]),
                "n": pa.array([len(d2)], pa.int64()),
            }
        )

    st = ds.select_columns([vector_column]).map_batches(
        d2_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    mu2 = float(st["sd"].sum()) / n
    var = float(st["sd2"].sum()) / n - mu2 * mu2
    thr = round(mu2 + z_threshold * (max(var, 0.0) ** 0.5), round_to)

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        mu = ray.get(mean_ref) if isinstance(mean_ref, ray.ObjectRef) else mean_ref
        m = np.array(batch[vector_column].to_pylist(), dtype=np.float64)
        d2 = np.round(((m - mu) ** 2).sum(axis=1), round_to)
        return pa.table(
            {
                id_column: batch[id_column].combine_chunks(),
                "dist2": pa.array(d2),
                "is_outlier": pa.array(d2 > thr),
            }
        )

    return ds.select_columns([id_column, vector_column]).map_batches(
        stamp, batch_format="pyarrow", batch_size=None
    )


def pca_project(
    ds: ray.data.Dataset,
    k: int,
    vector_column: str = "embedding",
    id_column: str = "vec_id",
    round_to: int = 6,
) -> tuple[ray.data.Dataset, np.ndarray, np.ndarray]:
    """Project every row onto the top-``k`` principal components:
    returns ``(Dataset (id, pc_0..pc_{k-1}), components (k, d),
    explained_variance (k,))``. Deterministic sign convention: each
    component's largest-magnitude coordinate is positive. The moment
    pass is the only corpus pass besides the projection itself."""
    s, ss, n = _moment_partials(ds, vector_column)
    if n == 0:
        cols = {id_column: pa.array([], pa.int64())}
        for c in range(k):
            cols[f"pc_{c}"] = pa.array([], pa.float64())
        return ray.data.from_arrow(pa.table(cols)), np.zeros((k, 0)), np.zeros(k)
    d = len(s)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    for r in range(len(comps)):  # sign convention
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    evar = w[order]
    mean_ref = ray.put(mean)
    comps_ref = ray.put(np.ascontiguousarray(comps))

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {id_column: pa.array([], pa.int64())}
            for c in range(len(comps)):
                cols[f"pc_{c}"] = pa.array([], pa.float64())
            return pa.table(cols)
        mu = ray.get(mean_ref) if isinstance(mean_ref, ray.ObjectRef) else mean_ref
        cc = ray.get(comps_ref) if isinstance(comps_ref, ray.ObjectRef) else comps_ref
        m = np.array(batch[vector_column].to_pylist(), dtype=np.float64)
        proj = np.round((m - mu) @ cc.T, round_to)
        cols = {id_column: batch[id_column].combine_chunks()}
        for c in range(proj.shape[1]):
            cols[f"pc_{c}"] = pa.array(proj[:, c])
        return pa.table(cols)

    return (
        ds.map_batches(project, batch_format="pyarrow", batch_size=None),
        comps,
        evar,
    )
