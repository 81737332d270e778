"""Distributed covariance + PCA over an embedding column."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.pca import embedding_covariance, pca_project


def _tbl(n=400, d=6, seed=2):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, 2))
    mix = rng.standard_normal((2, d))
    m = base @ mix + 0.05 * rng.standard_normal((n, d))
    return pa.table(
        {
            "vec_id": list(range(n)),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float64())),
        }
    ), m


class TestCovariance:
    def test_matches_duckdb(self):
        tbl, _ = _tbl()
        got = embedding_covariance(
            ray.data.from_arrow(tbl).repartition(5)
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT gi.i, gj.j, round(avg(embedding[gi.i + 1] * embedding[gj.j + 1]) "
            "- avg(embedding[gi.i + 1]) * avg(embedding[gj.j + 1]), 6) AS cov "
            "FROM t CROSS JOIN (SELECT unnest(range(6)) AS i) gi "
            "CROSS JOIN (SELECT unnest(range(6)) AS j) gj GROUP BY gi.i, gj.j"
        ).fetchdf()
        key = lambda df: df.sort_values(["i", "j"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(key(got), key(exp), check_dtype=False)

    def test_partition_invariance_vs_numpy(self):
        tbl, m = _tbl(seed=9)
        ds = ray.data.from_arrow(tbl)
        a = embedding_covariance(ds.repartition(1)).to_pandas()
        b = embedding_covariance(ds.repartition(8)).to_pandas()
        key = lambda df: df.sort_values(["i", "j"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(key(a), key(b))
        ref = np.cov(m.T, bias=True)
        got = key(a)["cov"].to_numpy().reshape(6, 6)
        assert np.allclose(got, ref, atol=2e-6)


class TestPCA:
    def test_matches_local_pca(self):
        tbl, m = _tbl(n=600, seed=5)
        out, comps, evar = pca_project(
            ray.data.from_arrow(tbl).repartition(4), k=2
        )
        got = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
        # local reference with the same sign convention
        c = m - m.mean(axis=0)
        w, v = np.linalg.eigh(np.cov(m.T, bias=True))
        order = np.argsort(w)[::-1][:2]
        ref_comps = v[:, order].T
        for r in range(2):
            if ref_comps[r, np.argmax(np.abs(ref_comps[r]))] < 0:
                ref_comps[r] = -ref_comps[r]
        ref_proj = c @ ref_comps.T
        assert np.allclose(comps, ref_comps, atol=1e-9)
        assert np.allclose(
            got[["pc_0", "pc_1"]].to_numpy(), np.round(ref_proj, 6), atol=1e-6
        )
        # the two synthetic latent dims dominate the variance
        assert evar[:2].sum() / np.trace(np.cov(m.T, bias=True)) > 0.99

    def test_empty(self):
        tbl = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
        out, comps, evar = pca_project(ray.data.from_arrow(tbl), k=3)
        assert out.count() == 0
