"""pipelines/pca.embedding_outliers: numpy-reference parity, planted
outlier detection, partition invariance, empty input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.pca import embedding_outliers


def _make(n=400, d=8, outliers=5, seed=9):
    rng = np.random.default_rng(seed)
    m = rng.normal(0, 1, (n, d)).astype(np.float32)
    idx = rng.choice(n, outliers, replace=False)
    m[idx] += 25.0  # far off-distribution
    return m, set(idx.tolist())


def _ref(m, z=2.0):
    x = m.astype(np.float64)
    mu = x.sum(axis=0) / len(x)
    d2 = ((x - mu) ** 2).sum(axis=1)
    m2 = d2.sum() / len(d2)
    var = (d2 * d2).sum() / len(d2) - m2 * m2
    thr = round(m2 + z * max(var, 0.0) ** 0.5, 6)
    return np.round(d2, 6), np.round(d2, 6) > thr


def test_planted_outliers_and_parity():
    m, planted = _make()
    t = pa.table(
        {"vec_id": np.arange(len(m)), "embedding": [r.tolist() for r in m]}
    )
    exp_d2, exp_flag = _ref(m)
    for parts in (1, 6):
        got = (
            embedding_outliers(ray.data.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert np.allclose(got["dist2"].to_numpy(), exp_d2, atol=1e-9)
        assert got["is_outlier"].tolist() == exp_flag.tolist()
    flagged = set(got.loc[got["is_outlier"], "vec_id"].tolist())
    assert planted <= flagged  # every planted far-point is caught
    assert len(flagged) < len(m) * 0.1


def test_empty():
    t = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    assert embedding_outliers(ray.data.from_arrow(t)).count() == 0
