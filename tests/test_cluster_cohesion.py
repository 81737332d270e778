"""cluster_cohesion: per-cluster micro-averaged pairwise shingle Jaccard
from exact integer partials. Checked against a brute-force pairwise
reference, for partition invariance, and for the exclusion of singletons."""

from __future__ import annotations

import itertools

import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.eval_cluster import cluster_cohesion


def _grams(text: str, n: int = 2) -> set[str]:
    import re

    toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute(rows: list[tuple[int, int, str]]) -> dict[int, tuple]:
    """cluster -> (n_members, n_pairs, sum_inter, sum_union, cohesion)."""
    by_cl: dict[int, list[tuple[int, str]]] = {}
    for doc, cl, text in rows:
        by_cl.setdefault(cl, []).append((doc, text))
    out = {}
    for cl, members in by_cl.items():
        if len(members) < 2:
            continue
        si = su = 0
        pairs = 0
        for (_, ta), (_, tb) in itertools.combinations(members, 2):
            ga, gb = _grams(ta), _grams(tb)
            si += len(ga & gb)
            su += len(ga | gb)
            pairs += 1
        out[cl] = (len(members), pairs, si, su, si / su)
    return out


ROWS = [
    # cluster 1: two identical + one near-dup
    (10, 1, "alpha beta gamma delta epsilon zeta"),
    (11, 1, "alpha beta gamma delta epsilon zeta"),
    (12, 1, "alpha beta gamma delta epsilon ETA"),
    # cluster 2: two disjoint docs (chained by a hypothetical LSH collision)
    (20, 2, "one two three four five"),
    (21, 2, "six seven eight nine ten"),
    # singleton — must not appear
    (30, 3, "lonely document with no duplicate partner"),
    # cluster 4: pair sharing half their grams
    (40, 4, "red green blue yellow purple"),
    (41, 4, "red green blue cyan magenta"),
]


def _run(num_partitions: int):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "__CLUSTER__": pa.array([r[1] for r in ROWS], pa.int64()),
            "text": [r[2] for r in ROWS],
        }
    )
    return (
        cluster_cohesion(
            ray.data.from_arrow(t), ngram_size=2, num_partitions=num_partitions
        )
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )


def test_matches_bruteforce_pairwise():
    got = _run(4)
    exp = _brute(ROWS)
    assert sorted(got.index) == sorted(exp)
    for cl, (k, pairs, si, su, coh) in exp.items():
        row = got.loc[cl]
        assert row["n_members"] == k
        assert row["n_pairs"] == pairs
        assert row["sum_inter"] == si
        assert row["sum_union"] == su
        assert row["cohesion"] == pytest.approx(coh, abs=0)
    # sanity on the planted structure
    assert got.loc[2, "sum_inter"] == 0 and got.loc[2, "cohesion"] == 0.0
    assert got.loc[1, "cohesion"] > 0.7


def test_partition_invariance():
    a = _run(1)
    b = _run(8)
    assert (a == b).all().all()


def test_empty_and_all_singletons():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "__CLUSTER__": pa.array([1, 2], pa.int64()),
            "text": ["only one member here", "and another alone"],
        }
    )
    out = cluster_cohesion(ray.data.from_arrow(t), num_partitions=2).to_pandas()
    assert len(out) == 0
    t0 = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "__CLUSTER__": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }
    )
    out0 = cluster_cohesion(ray.data.from_arrow(t0), num_partitions=2).to_pandas()
    assert len(out0) == 0
