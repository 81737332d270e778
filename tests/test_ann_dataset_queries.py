"""Queries-as-Dataset ANN (pipelines/ann.brute_force_topk_ds): the
many-queries path — partials merge through the hash exchange, never on the
driver. Parity vs the driver-array API and vs exact numpy; a 100k-query run
proves the merge is distributed (result is a Dataset; the driver only ever
sees the final top-k rows it chooses to collect)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.ann import brute_force_topk, brute_force_topk_ds

DIM = 16


def _vec_table(ids, mat, id_col="vec_id"):
    return pa.table(
        {
            id_col: pa.array([int(i) for i in ids], pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
        }
    )


def _corpus(n=200, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, DIM).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


def _exact_topk(corpus, queries, k):
    """(query_row, vec_id) exact reference with the same (score desc,
    vec_id asc) tie-break."""
    sims = queries @ corpus.T
    out = {}
    for qi in range(len(queries)):
        order = sorted(range(len(corpus)), key=lambda j: (-sims[qi, j], j))
        out[qi] = [(j, float(sims[qi, j])) for j in order[:k]]
    return out


class TestTopKDatasetQueries:
    def test_matches_driver_array_api(self):
        corpus = _corpus()
        queries = corpus[:7] + 0.01 * np.arange(DIM, dtype=np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        ds = ray.data.from_arrow(_vec_table(range(len(corpus)), corpus)).repartition(4)
        q_ds = ray.data.from_arrow(
            _vec_table(range(len(queries)), queries, id_col="query_id")
        )
        got = (
            brute_force_topk_ds(ds, q_ds, k=5, num_partitions=4)
            .to_pandas()
            .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        ref = (
            brute_force_topk(ds, queries, k=5)
            .to_pandas()
            .rename(columns={"query_idx": "query_id"})
            .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        assert len(got) == len(ref) == 5 * len(queries)
        assert (got["query_id"].values == ref["query_id"].values).all()
        assert (got["vec_id"].values == ref["vec_id"].values).all()
        np.testing.assert_allclose(got["score"].values, ref["score"].values, rtol=1e-6)

    def test_exact_values_and_tiebreak(self):
        corpus = _corpus(50, seed=11)
        queries = corpus[[3, 20, 41]]
        ds = ray.data.from_arrow(_vec_table(range(50), corpus)).repartition(3)
        q_ds = ray.data.from_arrow(_vec_table([100, 200, 300], queries, "query_id"))
        got = brute_force_topk_ds(ds, q_ds, k=4, num_partitions=2).to_pandas()
        ref = _exact_topk(corpus, queries, 4)
        for qpos, qid in enumerate([100, 200, 300]):
            rows = got[got["query_id"] == qid].sort_values(
                ["score", "vec_id"], ascending=[False, True]
            )
            assert list(rows["vec_id"]) == [j for j, _ in ref[qpos]]
            np.testing.assert_allclose(
                rows["score"].values, [s for _, s in ref[qpos]], rtol=1e-6
            )
            # each query IS corpus row -> top-1 is itself at score 1.0
            assert rows.iloc[0]["vec_id"] == [3, 20, 41][qpos]
            assert abs(rows.iloc[0]["score"] - 1.0) < 1e-6

    def test_100k_queries_distributed_merge(self):
        """The many-queries contract: 100k query rows, result stays a
        Dataset; every query's top-1 is its source corpus vector."""
        corpus = _corpus(100, seed=5)
        reps = 1000  # 100 * 1000 = 100k queries
        qids = np.arange(100 * reps, dtype=np.int64)
        src = np.tile(np.arange(100, dtype=np.int64), reps)
        qmat = corpus[src]
        ds = ray.data.from_arrow(_vec_table(range(100), corpus)).repartition(2)
        q_ds = ray.data.from_arrow(_vec_table(qids, qmat, "query_id")).repartition(8)
        res = brute_force_topk_ds(ds, q_ds, k=1, num_partitions=8)
        assert isinstance(res, ray.data.Dataset)
        assert res.count() == 100 * reps
        # spot-check a slice: top-1 == source vector (cosine 1.0)
        sample = res.to_pandas()
        sample = sample.set_index("query_id").sort_index()
        np.testing.assert_array_equal(sample["vec_id"].values, src[sample.index.values])
        assert (sample["score"].values > 0.999999).all()

    def test_empty_inputs(self):
        corpus = _corpus(10)
        ds = ray.data.from_arrow(_vec_table(range(10), corpus))
        empty_q = ray.data.from_arrow(_vec_table([], np.empty((0, DIM), np.float32), "query_id"))
        res = brute_force_topk_ds(ds, empty_q, k=3, num_partitions=2)
        assert res.count() == 0
        empty_c = ray.data.from_arrow(_vec_table([], np.empty((0, DIM), np.float32)))
        q_ds = ray.data.from_arrow(_vec_table([1], corpus[:1], "query_id"))
        res2 = brute_force_topk_ds(empty_c, q_ds, k=3, num_partitions=2)
        assert res2.count() == 0


class TestIVFTopKDatasetQueries:
    def test_full_probe_matches_brute_ds(self):
        """nprobe == n_cells is exhaustive: identical rows to the brute
        Dataset-queries path."""
        from text_dedup_ray.pipelines.ann import ivf_topk_ds

        corpus = _corpus(150, seed=21)
        queries = corpus[[5, 60, 120]]
        ds = ray.data.from_arrow(_vec_table(range(150), corpus)).repartition(3)
        q_ds = ray.data.from_arrow(_vec_table([7, 8, 9], queries, "query_id"))
        got = (
            ivf_topk_ds(ds, q_ds, k=5, n_cells=8, nprobe=8, num_partitions=4)
            .to_pandas()
            .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        ref = (
            brute_force_topk_ds(ds, q_ds, k=5, num_partitions=4)
            .to_pandas()
            .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        assert (got["query_id"].values == ref["query_id"].values).all()
        assert (got["vec_id"].values == ref["vec_id"].values).all()
        np.testing.assert_allclose(got["score"].values, ref["score"].values, rtol=1e-6)

    def test_partial_probe_recall_on_clustered_data(self):
        """Clustered corpus: partial-probe IVF recalls >= 0.9 of exact top-k
        for queries drawn from the clusters."""
        from text_dedup_ray.pipelines.ann import ivf_topk_ds

        rng = np.random.RandomState(3)
        centers = rng.randn(8, DIM).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        pts = np.repeat(centers, 50, axis=0) + 0.05 * rng.randn(400, DIM).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        queries = centers[:4] + 0.02 * rng.randn(4, DIM).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        ds = ray.data.from_arrow(_vec_table(range(400), pts)).repartition(4)
        q_ds = ray.data.from_arrow(_vec_table(range(4), queries, "query_id"))
        got = ivf_topk_ds(
            ds, q_ds, k=10, n_cells=8, nprobe=3, num_partitions=4
        ).to_pandas()
        exact = _exact_topk(pts, queries, 10)
        hits = total = 0
        for qid in range(4):
            want = {j for j, _ in exact[qid]}
            have = set(got[got["query_id"] == qid]["vec_id"])
            hits += len(want & have)
            total += len(want)
        assert hits / total >= 0.9


class TestLSHTopKDatasetQueries:
    def test_planted_exact_copies_recalled(self):
        """Exact copies collide in every table: each query's top-1 must be
        its source vector at score ~1.0; merged result stays a Dataset."""
        from text_dedup_ray.pipelines.ann import lsh_bucket_topk_ds

        corpus = _corpus(120, seed=31)
        queries = corpus[:20]
        ds = ray.data.from_arrow(_vec_table(range(120), corpus)).repartition(3)
        q_ds = ray.data.from_arrow(_vec_table(range(1000, 1020), queries, "query_id"))
        res = lsh_bucket_topk_ds(
            ds, q_ds, k=3, num_tables=16, num_bits=4, num_partitions=4
        )
        assert isinstance(res, ray.data.Dataset)
        got = res.to_pandas().sort_values(
            ["query_id", "score", "vec_id"], ascending=[True, False, True]
        )
        top1 = got.groupby("query_id").head(1)
        assert len(top1) == 20
        np.testing.assert_array_equal(
            top1["vec_id"].values, top1["query_id"].values - 1000
        )
        assert (top1["score"].values > 0.999999).all()

    def test_matches_array_api(self):
        """Same planes seed: identical candidate sets and ranks as the
        driver-array lsh_bucket_topk."""
        from text_dedup_ray.pipelines.ann import lsh_bucket_topk, lsh_bucket_topk_ds

        corpus = _corpus(80, seed=17)
        queries = corpus[[4, 40]]
        ds = ray.data.from_arrow(_vec_table(range(80), corpus)).repartition(2)
        q_ds = ray.data.from_arrow(_vec_table([0, 1], queries, "query_id"))
        got = (
            lsh_bucket_topk_ds(
                ds, q_ds, k=5, num_tables=12, num_bits=5, num_partitions=2
            )
            .to_pandas()
            .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        ref = (
            lsh_bucket_topk(ds, queries, k=5, num_tables=12, num_bits=5)
            .to_pandas()
            .rename(columns={"query_idx": "query_id"})
            .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        assert (got["query_id"].values == ref["query_id"].values).all()
        assert (got["vec_id"].values == ref["vec_id"].values).all()
        np.testing.assert_allclose(got["score"].values, ref["score"].values, rtol=1e-6)
