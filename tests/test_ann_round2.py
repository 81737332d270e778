"""Round-2 ANN additions: exact cosine pair mining, LSH shuffle-payload
bound, vectorized bucket scan equivalence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.ann import (
    brute_force_topk,
    embedding_cosine_dedup,
    embedding_cosine_dedup_exact,
    embedding_cosine_pairs,
    first_occurrence_mask,
    lsh_bucket_topk,
)


def _table(vecs: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )


class TestExactPairs:
    def test_matches_numpy_ground_truth(self):
        rng = np.random.RandomState(11)
        vecs = rng.randn(120, 12).astype(np.float32)
        vecs[100:110] = vecs[:10]  # planted exact copies
        ds = ray.data.from_arrow(_table(vecs)).repartition(5)
        out = embedding_cosine_pairs(ds, threshold=0.95).to_pandas()
        got = set(zip(out["src"], out["dst"]))

        vn = vecs.astype(np.float64)
        vn /= np.linalg.norm(vn, axis=1, keepdims=True)
        sims = vn @ vn.T
        ii, jj = np.nonzero(np.triu(sims >= 0.95, k=1))
        expect = {(max(a, b), min(a, b)) for a, b in zip(ii.tolist(), jj.tolist())}
        assert got == expect
        assert len(expect) >= 10

    def test_exact_dedup_clusters(self):
        rng = np.random.RandomState(12)
        vecs = rng.randn(60, 8).astype(np.float32)
        vecs[50:55] = vecs[:5]
        ds = ray.data.from_arrow(_table(vecs)).repartition(3)
        parents = embedding_cosine_dedup_exact(ds, threshold=0.999)
        for i in range(5):
            assert parents[50 + i] == i
            assert parents[i] == i  # roots present (cluster map incl. root)


class TestLshPayloadBound:
    def test_vec_attached_once_per_distinct_partition(self):
        rng = np.random.RandomState(13)
        part = rng.randint(0, 4, size=(100, 8))  # 8 tables, 4 partitions
        mask = first_occurrence_mask(part)
        # per row: one True per DISTINCT partition value, so <= 4 << 8
        per_row = mask.sum(axis=1)
        assert (per_row <= 4).all()
        assert per_row.sum() < 100 * 8  # never flat x num_tables
        for r in range(100):
            kept = part[r][mask[r]]
            assert len(set(kept.tolist())) == len(kept)  # no dup parts kept
            assert set(kept.tolist()) == set(part[r].tolist())  # none missing

    def test_lsh_dedup_planted_recall_small_partitions(self):
        rng = np.random.RandomState(14)
        vecs = rng.randn(80, 16).astype(np.float32)
        vecs[70:80] = vecs[:10] * 1.0001
        ds = ray.data.from_arrow(_table(vecs)).repartition(4)
        parents = embedding_cosine_dedup(
            ds, threshold=0.999, num_tables=8, num_bits=6, merge_partitions=4
        )
        for i in range(10):
            assert parents.get(70 + i, 70 + i) == i


class TestVectorizedBucketScan:
    def test_lsh_topk_subset_of_brute_force_universe(self):
        rng = np.random.RandomState(15)
        vecs = rng.randn(300, 16).astype(np.float32)
        q = vecs[:6]
        ds = ray.data.from_arrow(_table(vecs)).repartition(3)
        out = lsh_bucket_topk(ds, q, k=4).to_pandas()
        bf = brute_force_topk(ds, q, k=4).to_pandas()
        # each query finds itself (cosine 1.0 — also brute force's top hit)
        for qi in range(6):
            assert qi in out[out.query_idx == qi]["vec_id"].tolist()
            assert bf[bf.query_idx == qi]["vec_id"].tolist()[0] == qi
        # scores are true cosines: spot-check against numpy
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for _, row in out.head(20).iterrows():
            expect = float(vn[int(row.query_idx)] @ vn[int(row.vec_id)])
            assert abs(row.score - expect) < 1e-5


class TestIVF:
    def test_full_probe_matches_brute_force(self):
        """nprobe == n_cells makes IVF exhaustive: result set must equal
        brute force exactly (same ids per query; scores equal)."""
        from text_dedup_ray.pipelines.ann import ivf_topk

        rng = np.random.RandomState(21)
        vecs = rng.randn(400, 16).astype(np.float32)
        qs = rng.randn(5, 16).astype(np.float32)
        ds = ray.data.from_arrow(_table(vecs)).repartition(4)
        exact = brute_force_topk(ds, qs, k=10).to_pandas()
        ivf = ivf_topk(
            ds, qs, k=10, n_cells=16, nprobe=16, train_sample=400
        ).to_pandas()
        for q in range(5):
            e = exact[exact.query_idx == q]
            g = ivf[ivf.query_idx == q]
            assert set(g["vec_id"]) == set(e["vec_id"])
            assert np.allclose(
                sorted(g["score"]), sorted(e["score"]), atol=1e-5
            )

    def test_partial_probe_recall(self):
        """With clustered data and nprobe << n_cells, recall@10 stays high
        and the planted nearest neighbor is found."""
        from text_dedup_ray.pipelines.ann import ivf_topk

        rng = np.random.RandomState(22)
        # 8 well-separated clusters
        centers = rng.randn(8, 24).astype(np.float32) * 6
        vecs = np.concatenate(
            [c + rng.randn(100, 24).astype(np.float32) for c in centers]
        )
        qs = centers[:4] + rng.randn(4, 24).astype(np.float32) * 0.1
        ds = ray.data.from_arrow(_table(vecs)).repartition(4)
        exact = brute_force_topk(ds, qs, k=10).to_pandas()
        ivf = ivf_topk(
            ds, qs, k=10, n_cells=16, nprobe=4, train_sample=800
        ).to_pandas()
        hits = 0
        for q in range(4):
            e = set(exact[exact.query_idx == q]["vec_id"])
            g = set(ivf[ivf.query_idx == q]["vec_id"])
            hits += len(e & g)
        assert hits / (4 * 10) >= 0.9

    def test_kmeans_reseeds_empty_cells(self):
        from text_dedup_ray.pipelines.ann import spherical_kmeans

        pts = np.ones((10, 4), dtype=np.float32)  # all identical
        cents = spherical_kmeans(pts, n_cells=4, iters=3, seed=1)
        assert cents.shape == (4, 4)
        assert np.isfinite(cents).all()
