"""cluster_map_meet: partition intersection (AND-fusion) of cluster maps."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray
import ray.data

from text_dedup_ray.stages.cc import cluster_map_meet


def _as_ds(d: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "row_id": pa.array(list(d.keys()), pa.int64()),
                "cluster_id": pa.array(list(d.values()), pa.int64()),
            }
        )
    ).repartition(2)


def _meet(maps, **kw) -> dict:
    t = cluster_map_meet(maps, **kw).to_pandas()
    if len(t) == 0:
        return {}
    return dict(zip(t["row_id"], t["cluster_id"]))


def test_meet_two_maps():
    m1 = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}  # {1,2,3}, {4,5}
    m2 = {2: 2, 3: 2, 4: 4, 6: 4}  # {2,3}, {4,6}
    # rows together in BOTH: only {2,3}
    assert _meet([m1, m2], num_partitions=4) == {2: 2, 3: 2}


def test_meet_mixed_dict_and_dataset():
    m1 = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    m2 = {2: 2, 3: 2, 4: 4, 6: 4}
    assert _meet([m1, _as_ds(m2)], num_partitions=3) == {2: 2, 3: 2}
    assert _meet([_as_ds(m1), _as_ds(m2)], num_partitions=3) == {2: 2, 3: 2}


def test_meet_identical_maps_is_identity_on_nontrivial():
    m = {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert _meet([m, dict(m)], num_partitions=2) == {
        10: 10,
        11: 10,
        12: 10,
        20: 20,
        21: 20,
    }


def test_meet_three_maps_needs_all_agree():
    m1 = {1: 1, 2: 1, 3: 1}
    m2 = {1: 1, 2: 1, 3: 3}
    m3 = {1: 1, 2: 1, 3: 1}
    assert _meet([m1, m2, m3], num_partitions=2) == {1: 1, 2: 1}


def test_meet_disjoint_maps_is_empty():
    m1 = {1: 1, 2: 1}
    m2 = {3: 3, 4: 3}
    assert _meet([m1, m2], num_partitions=2) == {}


def test_meet_requires_a_map():
    with pytest.raises(ValueError):
        cluster_map_meet([])
