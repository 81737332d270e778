"""pipelines/overlap.source_overlap: exact pairwise cohort Jaccard vs a
direct set-based recomputation, plus edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.functions.tokenization import ngrams, tokenize
from text_dedup_ray.pipelines.overlap import source_overlap


def _shingles(text: str, n=3, ml=1) -> set:
    return {" ".join(g) for g in ngrams(tokenize(text), n, ml)}


def _expected(docs, srcs, n=3, ml=1):
    sets: dict[str, set] = {}
    for t, s in zip(docs, srcs):
        sets.setdefault(s, set()).update(_shingles(t, n, ml))
    out = {}
    groups = sorted(sets)
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            out[(a, b)] = (len(sets[a]), len(sets[b]), inter,
                           1.0 if union == 0 else inter / union)
    return out


def test_matches_set_recomputation_and_partition_invariance():
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    docs, srcs = [], []
    for i in range(400):
        docs.append(" ".join(rng.choice(vocab, size=rng.integers(1, 12))))
        srcs.append(f"s{int(rng.integers(0, 4))}")
    t = pa.table({"doc_id": np.arange(400), "text": docs, "source": srcs})
    exp = _expected(docs, srcs)
    for parts in (1, 4, 16):
        got = (
            source_overlap(
                ray.data.from_arrow(t).repartition(6), num_partitions=parts
            )
            .to_pandas()
            .set_index(["source_a", "source_b"])
        )
        assert len(got) == len(exp)
        for (a, b), (na, nb, c, j) in exp.items():
            row = got.loc[(a, b)]
            assert (row["n_a"], row["n_b"], row["n_common"]) == (na, nb, c)
            assert row["jaccard"] == j


def test_identical_and_disjoint_cohorts():
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["x y z w", "x y z w", "p q r s"],
            "source": ["a", "b", "c"],
        }
    )
    got = (
        source_overlap(ray.data.from_arrow(t))
        .to_pandas()
        .set_index(["source_a", "source_b"])
    )
    assert got.loc[("a", "b")]["jaccard"] == 1.0
    assert got.loc[("a", "c")]["jaccard"] == 0.0
    assert got.loc[("a", "b")]["n_common"] == 2  # "x y z", "y z w"


def test_single_source_and_empty():
    one = pa.table({"doc_id": [0], "text": ["a b c"], "source": ["only"]})
    assert source_overlap(ray.data.from_arrow(one)).count() == 0
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
        }
    )
    assert source_overlap(ray.data.from_arrow(empty)).count() == 0


def test_too_many_cohorts_raises():
    t = pa.table(
        {
            "doc_id": list(range(64)),
            "text": ["w"] * 64,
            "source": [f"s{i:03d}" for i in range(64)],
        }
    )
    with pytest.raises(ValueError, match="at most 63"):
        source_overlap(ray.data.from_arrow(t))
