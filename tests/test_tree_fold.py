"""tree_fold: multi-level reduce of per-block partials — the scale path for
folds whose partials are big (DSIR 64k-bucket sparse counts, PCA d x d
moments).  Forced-many-blocks parity: with far more blocks than ``fan_in``
(several combine levels deep) the result must be identical to the
single-reducer answer and to a direct driver-side computation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.stages.exchange import tree_fold


def _partials_ds(num_blocks: int, rows_per_block: int, seed: int = 7):
    """A dataset of per-block sparse (b, c) count partials + the dense truth."""
    rng = np.random.default_rng(seed)
    tables = []
    dense = np.zeros(64, np.int64)
    for _ in range(num_blocks):
        b = rng.integers(0, 64, rows_per_block).astype(np.int64)
        c = rng.integers(1, 5, rows_per_block).astype(np.int64)
        np.add.at(dense, b, c)
        tables.append(
            pa.table({"b": pa.array(b), "c": pa.array(c)})
        )
    return ray.data.from_arrow(tables), dense


def _combine(group: pa.Table) -> pa.Table:
    if group.num_rows == 0 or "b" not in group.column_names:
        return pa.table({"b": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
    b = group["b"].to_numpy(zero_copy_only=False)
    ub, inv = np.unique(b, return_inverse=True)
    cc = np.bincount(inv, weights=group["c"].to_numpy(zero_copy_only=False))
    return pa.table(
        {"b": pa.array(ub.astype(np.int64)), "c": pa.array(cc.astype(np.int64))}
    )


def _fold(group: pa.Table) -> pa.Table:
    if group.num_rows == 0 or "b" not in group.column_names:
        return pa.table({"counts": pa.array([], pa.list_(pa.int64()))})
    dense = np.zeros(64, np.int64)
    np.add.at(
        dense,
        group["b"].to_numpy(zero_copy_only=False),
        group["c"].to_numpy(zero_copy_only=False),
    )
    return pa.table({"counts": pa.array([dense.tolist()])})


class TestTreeFold:
    def test_many_blocks_multi_level_parity(self):
        # 70 blocks at fan_in=4 -> 3 combine levels before the final fold
        ds, truth = _partials_ds(num_blocks=70, rows_per_block=20)
        rows = tree_fold(ds, _combine, _fold, fan_in=4).take_all()
        assert len(rows) == 1
        assert np.array_equal(np.asarray(rows[0]["counts"], np.int64), truth)

    def test_single_level_matches(self):
        ds, truth = _partials_ds(num_blocks=5, rows_per_block=10, seed=3)
        rows = tree_fold(ds, _combine, _fold, fan_in=32).take_all()
        assert np.array_equal(np.asarray(rows[0]["counts"], np.int64), truth)

    def test_empty_dataset(self):
        empty = ray.data.from_arrow(
            pa.table({"b": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        ).filter(lambda r: False)
        rows = tree_fold(empty, _combine, _fold, fan_in=4).take_all()
        assert rows == [] or rows[0].get("counts") in ([], None)

    def test_dsir_and_pca_route_through_tree_fold_many_blocks(self):
        # the two converted call sites, forced well past fan_in block counts
        from text_dedup_ray.pipelines.dsir import hashed_gram_counts
        from text_dedup_ray.pipelines.pca import embedding_covariance

        texts = [f"alpha beta gamma doc{i} token{i % 11}" for i in range(400)]
        docs = ray.data.from_items([{"text": t} for t in texts]).repartition(60)
        counts = hashed_gram_counts(docs, num_buckets=256)
        single = hashed_gram_counts(
            ray.data.from_items([{"text": t} for t in texts]).repartition(1),
            num_buckets=256,
        )
        assert np.array_equal(counts, single)

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(300, 4)).round(3)
        emb = ray.data.from_items(
            [{"embedding": v.tolist()} for v in vecs]
        ).repartition(50)
        cov = embedding_covariance(emb, "embedding").to_pandas()
        mean = vecs.mean(axis=0)
        exp = (vecs.T @ vecs) / len(vecs) - np.outer(mean, mean)
        got = cov.pivot(index="i", columns="j", values="cov").to_numpy()
        assert np.allclose(got, exp, atol=1e-5)
