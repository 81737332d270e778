"""Distributed k-means: assignment oracle parity + full-corpus Lloyd's."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.kmeans import kmeans_assign, kmeans_fit


def _vals_sql(cents: np.ndarray) -> str:
    rows = ", ".join(
        f"({i}, [{', '.join(f'{x!r}' for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    return f"(VALUES {rows}) c(cid, cvec)"


def _blobs(n_per: int, seed: int = 3) -> tuple[pa.Table, np.ndarray]:
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0]]
    )
    pts = np.concatenate(
        [c + 0.3 * rng.standard_normal((n_per, 3)) for c in centers]
    )
    tbl = pa.table(
        {
            "vec_id": list(range(len(pts))),
            "embedding": pa.array([p.tolist() for p in pts], pa.list_(pa.float64())),
        }
    )
    return tbl, centers


class TestAssign:
    def test_matches_duckdb_l2(self):
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((200, 8))
        cents = rng.standard_normal((6, 8))
        tbl = pa.table(
            {
                "vec_id": list(range(200)),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
            }
        )
        got = (
            kmeans_assign(
                ray.data.from_arrow(tbl).repartition(4),
                cents,
                drop_vector=True,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT vec_id, cid AS cell FROM ("
            " SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id"
            "  ORDER BY list_distance(embedding::DOUBLE[], cvec), cid) AS rk"
            f" FROM t CROSS JOIN {_vals_sql(cents)}"
            ") WHERE rk = 1 ORDER BY vec_id"
        ).fetchdf()
        assert got.cell.tolist() == exp.cell.tolist()

    def test_cosine_and_distance_column(self):
        tbl = pa.table(
            {
                "vec_id": [0, 1],
                "embedding": pa.array(
                    [[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float64())
                ),
            }
        )
        cents = np.array([[1.0, 0.0], [0.0, 1.0]])
        got = (
            kmeans_assign(
                ray.data.from_arrow(tbl), cents, metric="cosine", dist_alias="dist"
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        assert got.cell.tolist() == [0, 1]
        assert got.dist.tolist() == [0.0, 0.0]


class TestFit:
    def test_matches_local_lloyds_on_blobs(self):
        tbl, centers = _blobs(40)
        init = np.array(
            [[4.0, 1.0, 0.0], [1.0, 4.0, 0.0], [0.5, 0.5, 4.0]]
        )
        got_c, got_n = kmeans_fit(
            ray.data.from_arrow(tbl).repartition(5),
            k=3,
            iters=5,
            init=init,
            num_partitions=3,
        )
        # local reference Lloyd's with identical init/semantics
        m = np.array(tbl["embedding"].to_pylist())
        c = init.copy()
        for _ in range(5):
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            for j in range(3):
                if (a == j).any():
                    c[j] = m[a == j].mean(axis=0)
        assert np.allclose(got_c, c, atol=1e-9)
        assert got_n.sum() == len(m) and (got_n > 0).all()

    def test_partition_invariance_and_empty_cell_kept(self):
        tbl, _ = _blobs(15)
        init = np.array(
            [[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0], [99.0, 99.0, 99.0]]
        )
        a_c, a_n = kmeans_fit(
            ray.data.from_arrow(tbl).repartition(2), k=4, iters=3, init=init,
            num_partitions=1,
        )
        b_c, b_n = kmeans_fit(
            ray.data.from_arrow(tbl).repartition(6), k=4, iters=3, init=init,
            num_partitions=5,
        )
        assert np.allclose(a_c, b_c, atol=1e-12) and (a_n == b_n).all()
        # the far-away cell never wins a point and keeps its init centroid
        assert a_n[3] == 0 and np.allclose(a_c[3], init[3])

    def test_seeded_init_reproducible(self):
        tbl, _ = _blobs(10)
        ds = ray.data.from_arrow(tbl)
        a, _ = kmeans_fit(ds, k=2, iters=2, seed=9)
        b, _ = kmeans_fit(ds, k=2, iters=2, seed=9)
        assert np.allclose(a, b)
