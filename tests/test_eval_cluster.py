"""pipelines/eval_cluster: distributed pair-counting Adjusted Rand Index.

Parity oracle is a ~10-line pure-python pair-counting ARI (the same
statistic sklearn's adjusted_rand_score computes — sklearn isn't in this
sandbox), plus partition invariance and the sklearn edge conventions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.eval_cluster import ari_components, clustering_ari


def _ari_local(a, b) -> float:
    from collections import Counter

    nij = Counter(zip(a, b))
    ai = Counter(a)
    bj = Counter(b)
    comb2 = lambda c: c * (c - 1) // 2
    s_ab = sum(comb2(c) for c in nij.values())
    s_a = sum(comb2(c) for c in ai.values())
    s_b = sum(comb2(c) for c in bj.values())
    n = len(a)
    if n < 2:
        return 1.0
    c_n2 = comb2(n)
    expected = (s_a / c_n2) * s_b
    denom = (s_a + s_b) / 2.0 - expected
    return 1.0 if denom == 0.0 else (s_ab - expected) / denom


def _labels_ds(a, b, parallelism=4):
    t = pa.table({"label_a": pa.array(a, pa.int64()), "label_b": pa.array(b, pa.int64())})
    return ray.data.from_arrow(t).repartition(parallelism)


def test_ari_matches_local_random(ray_session):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 12, size=500).tolist()
    b = rng.integers(0, 9, size=500).tolist()
    out = ari_components(_labels_ds(a, b))
    assert out["n_items"][0].as_py() == 500
    assert out["ari"][0].as_py() == pytest.approx(round(_ari_local(a, b), 6), abs=1e-9)


def test_ari_identical_and_disjoint(ray_session):
    a = [0, 0, 1, 1, 2, 2]
    out = ari_components(_labels_ds(a, a))
    assert out["ari"][0].as_py() == 1.0
    # one side all-singletons vs the other all-one-cluster: ARI 0 by the
    # expected-index correction (sklearn convention)
    singles = list(range(6))
    ones = [0] * 6
    out2 = ari_components(_labels_ds(singles, ones))
    assert out2["ari"][0].as_py() == 0.0


def test_ari_edge_small_inputs(ray_session):
    out = ari_components(_labels_ds([3], [9]))
    assert out["n_items"][0].as_py() == 1
    assert out["ari"][0].as_py() == 1.0  # n < 2 convention


def test_ari_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 5, size=300).tolist()
    b = rng.integers(0, 5, size=300).tolist()
    r1 = ari_components(_labels_ds(a, b, parallelism=1))
    r8 = ari_components(_labels_ds(a, b, parallelism=8))
    assert r1.equals(r8)


def test_clustering_ari_joins_on_common_support(ray_session):
    # ds_a covers ids 0..9, ds_b covers 5..14: ARI over the 5 shared ids
    ids_a = list(range(10))
    ids_b = list(range(5, 15))
    la = [i % 2 for i in ids_a]
    lb = [i % 3 for i in ids_b]
    ds_a = ray.data.from_arrow(
        pa.table({"id": pa.array(ids_a, pa.int64()), "la": pa.array(la, pa.int64())})
    )
    ds_b = ray.data.from_arrow(
        pa.table({"id": pa.array(ids_b, pa.int64()), "lb": pa.array(lb, pa.int64())})
    )
    out = clustering_ari(ds_a, ds_b, "id", "la", "lb", num_partitions=4)
    common = list(range(5, 10))
    expect = round(_ari_local([i % 2 for i in common], [i % 3 for i in common]), 6)
    assert out["n_items"][0].as_py() == 5
    assert out["ari"][0].as_py() == pytest.approx(expect, abs=1e-9)


class TestBCubed:
    def test_identical_partitions_score_one(self):
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.eval_cluster import bcubed_components

        labels = pa.table({"a": [1, 1, 2, 2, 3], "b": [7, 7, 8, 8, 9]})
        got = bcubed_components(
            ray.data.from_arrow(labels), "a", "b"
        ).to_pandas().iloc[0]
        assert got.bcubed_precision == 1.0 and got.bcubed_recall == 1.0
        assert got.bcubed_f1 == 1.0 and got.n_items == 5

    def test_textbook_example(self):
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.eval_cluster import bcubed_components

        # A merges everything; B has two clusters of 2 and 3
        labels = pa.table({"a": [0] * 5, "b": [1, 1, 2, 2, 2]})
        got = bcubed_components(
            ray.data.from_arrow(labels), "a", "b"
        ).to_pandas().iloc[0]
        # precision per item: cluster A has 5 items, overlap 2 or 3
        # -> (2*2/5 + 3*3/5)/5 = 13/25
        assert abs(got.bcubed_precision - 13 / 25) < 1e-9
        assert got.bcubed_recall == 1.0

    def test_matches_bruteforce_random(self):
        import numpy as np
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.eval_cluster import bcubed_components

        rng = np.random.default_rng(30)
        n = 500
        a = rng.integers(0, 40, n)
        b = rng.integers(0, 25, n)
        got = bcubed_components(
            ray.data.from_arrow(pa.table({"a": a.tolist(), "b": b.tolist()}))
            .repartition(4),
            "a", "b",
        ).to_pandas().iloc[0]
        # brute force per item
        import collections

        ca = collections.Counter(a.tolist())
        cb = collections.Counter(b.tolist())
        cell = collections.Counter(zip(a.tolist(), b.tolist()))
        p = sum(cell[(x, y)] / ca[x] for x, y in zip(a.tolist(), b.tolist())) / n
        r = sum(cell[(x, y)] / cb[y] for x, y in zip(a.tolist(), b.tolist())) / n
        assert abs(got.bcubed_precision - round(p, 6)) < 1e-6
        assert abs(got.bcubed_recall - round(r, 6)) < 1e-6
