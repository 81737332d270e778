"""SemDeDup: cell-quantized exact-cosine dedup."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.oracles import semdedup_sql
from text_dedup_ray.pipelines.ann import embedding_cosine_dedup_exact
from text_dedup_ray.pipelines.semdedup import semdedup
from text_dedup_ray.stages.cc import cluster_map_table


def _vec_table(n=120, dim=8, seed=4, copies=()):
    """Random unit-ish vectors; ``copies`` = [(new_id, src_id), ...]."""
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    ids = list(range(n))
    rows = {i: m[i] for i in ids}
    for new, src in copies:
        ids.append(new)
        rows[new] = rows[src]
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [rows[i].tolist() for i in ids], pa.list_(pa.float32())
            ),
        }
    )


def _ds(tbl, blocks=4):
    return ray.data.from_arrow(tbl).repartition(blocks)


def _map(parents):
    t = cluster_map_table(parents)
    if isinstance(t, ray.data.Dataset):
        t = t.to_pandas()
    else:
        t = t.to_pandas()
    return dict(zip(t.row_id, t.cluster_id))


class TestSemDedup:
    def test_planted_copies_merge(self):
        tbl = _vec_table(copies=[(1000, 3), (1001, 3), (2000, 7)])
        got = _map(semdedup(_ds(tbl), threshold=0.999, n_clusters=16, seed=1))
        assert got[1000] == got[1001] == got[3] == 3
        assert got[2000] == 7

    def test_single_cell_equals_exact_allpairs(self):
        # one centroid -> every vector in one cell -> must equal the exact path
        tbl = _vec_table(n=80, copies=[(500, 2), (501, 11)])
        cents = np.ones((1, 8), dtype=np.float64)
        a = _map(semdedup(_ds(tbl), threshold=0.9, centroids=cents))
        b = _map(embedding_cosine_dedup_exact(_ds(tbl), threshold=0.9))
        assert a == b

    def test_partition_count_invariance(self):
        tbl = _vec_table(n=100, copies=[(700, 5), (701, 5)])
        kw = dict(threshold=0.98, centroids=np.eye(8))
        a = _map(semdedup(_ds(tbl), num_partitions=1, **kw))
        b = _map(semdedup(_ds(tbl), num_partitions=9, **kw))
        assert a == b

    def test_giant_cell_cap_still_merges_rep_copies(self):
        # all vectors in one cell, max_cluster tiny: copies of the MIN-ID
        # member must still merge through the replicated representative
        rng = np.random.default_rng(9)
        base = rng.normal(size=8).astype(np.float32)
        vecs = [base] + [
            rng.normal(size=8).astype(np.float32) for _ in range(59)
        ] + [base, base]
        tbl = pa.table(
            {
                "vec_id": pa.array(list(range(60)) + [900, 901], pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        cents = np.ones((1, 8), dtype=np.float64)
        got = _map(
            semdedup(
                _ds(tbl, blocks=2), threshold=0.999, centroids=cents,
                max_cluster=10, num_partitions=1,
            )
        )
        assert got[900] == got[901] == got[0] == 0

    def test_matches_duckdb_oracle_eye_quantizer(self):
        tbl = _vec_table(n=150, dim=6, seed=12)
        con = duckdb.connect()
        con.register("embeddings", tbl)
        exp = con.execute(semdedup_sql(0.9, 10_000)).fetchdf()
        exp_map = dict(zip(exp.row_id, exp.cluster_id))

        def plant(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False) + 10_000
            c = pa.table({"vec_id": pa.array(ids, pa.int64()),
                          "embedding": t["embedding"]})
            return pa.concat_tables([t, c])

        planted = _ds(tbl).map_batches(plant, batch_format="pyarrow")
        got = _map(semdedup(planted, threshold=0.9, centroids=np.eye(6)))
        assert got == exp_map

    def test_empty(self):
        tbl = pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "embedding": pa.array([], pa.list_(pa.float32()))}
        )
        got = _map(semdedup(_ds(tbl, blocks=1), centroids=np.eye(4)))
        assert got == {}
