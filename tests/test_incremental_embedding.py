"""Incremental embedding-LSH dedup: equivalence with a full batch re-run.

The oracle is the batch pipeline itself: bootstrap(old) then increment(new)
must land on EXACTLY the cluster map ``embedding_cosine_dedup(old ∪ new)``
produces (same planes seed), including cross-batch dups, new-new dups, and
a new vector BRIDGING two old clusters (the merge path)."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.pipelines.ann import embedding_cosine_dedup
from text_dedup_ray.pipelines.incremental_embedding import (
    embedding_bootstrap,
    embedding_increment,
)

DIM = 16
THRESH = 0.95


def _vecs_table(ids: list[int], mat: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([row.tolist() for row in mat],
                                  pa.list_(pa.float32())),
        }
    )


def _corpus():
    """Old vecs 0..39 with two planted dup pairs; new vecs 100.. with an
    old-dup, a new-new dup, a BRIDGE vector near both old clusters, and
    uniques."""
    rng = np.random.RandomState(3)
    base = rng.randn(40, DIM).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    old = base.copy()
    old[7] = old[3]        # old dup pair -> root 3
    old[25] = old[11]      # old dup pair -> root 11
    old_ids = list(range(40))

    bridge = (old[3] + old[11])
    bridge /= np.linalg.norm(bridge)
    # a bridge must clear the threshold against BOTH roots; cos(bridge, a)
    # for a 16-dim random pair is ~cos(45deg)=0.7 < 0.95, so blend closer:
    b3 = 0.9 * old[3] + 0.1 * old[11]
    b3 /= np.linalg.norm(b3)
    new = np.stack([
        old[3],                                    # dup of old cluster 3
        rng.randn(DIM).astype(np.float32),         # unique
        old[11],                                   # dup of old cluster 11
        rng.randn(DIM).astype(np.float32),         # unique (dup'd next row)
    ])
    new = np.vstack([new, new[3]])                 # new-new dup pair
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    new_ids = [100 + i for i in range(len(new))]
    return old_ids, old, new_ids, new


def _nontrivial(parents: dict[int, int]) -> dict[int, int]:
    return {int(m): int(r) for m, r in parents.items() if m != r}


def _state_clusters(state_dir: str, version: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for f in glob.glob(f"{state_dir}/v{version:05d}/clusters/*.parquet"):
        t = pq.read_table(f)
        out.update(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))
    return out


class TestEmbeddingIncremental:
    def test_single_increment_equals_full_batch(self, tmp_path):
        old_ids, old, new_ids, new = _corpus()
        full = embedding_cosine_dedup(
            ray.data.from_arrow(
                pa.concat_tables([_vecs_table(old_ids, old), _vecs_table(new_ids, new)])
            ),
            threshold=THRESH,
        )
        state = str(tmp_path / "state")
        embedding_bootstrap(
            ray.data.from_arrow(_vecs_table(old_ids, old)), state, threshold=THRESH
        )
        inc = embedding_increment(ray.data.from_arrow(_vecs_table(new_ids, new)), state)
        got = _state_clusters(state, inc.state_version)
        assert got == _nontrivial(full)
        # sanity: the fixture actually exercises cross-batch dups
        assert 100 in got and got[100] == 3
        assert got[104] == 103  # new-new pair

    def test_bridge_merges_old_clusters(self, tmp_path):
        old_ids, old, _, _ = _corpus()
        bridge = 0.76 * old[3] + 0.65 * old[11]
        bridge /= np.linalg.norm(bridge)
        # only run if the bridge clears the threshold against both roots —
        # construct directly to be sure
        c3 = float(bridge @ old[3])
        c11 = float(bridge @ old[11])
        if not (c3 >= THRESH and c11 >= THRESH):
            pytest.skip("fixture geometry does not produce a valid bridge")
        new_ids = [200]
        new = bridge[None, :]
        full = embedding_cosine_dedup(
            ray.data.from_arrow(
                pa.concat_tables([_vecs_table(old_ids, old), _vecs_table(new_ids, new)])
            ),
            threshold=THRESH,
        )
        state = str(tmp_path / "state")
        embedding_bootstrap(
            ray.data.from_arrow(_vecs_table(old_ids, old)), state, threshold=THRESH
        )
        inc = embedding_increment(ray.data.from_arrow(_vecs_table(new_ids, new)), state)
        assert _state_clusters(state, inc.state_version) == _nontrivial(full)
        assert inc.merged_old_roots  # two old clusters merged

    def test_chained_increments(self, tmp_path):
        old_ids, old, new_ids, new = _corpus()
        state = str(tmp_path / "state")
        embedding_bootstrap(
            ray.data.from_arrow(_vecs_table(old_ids, old)), state, threshold=THRESH
        )
        inc1 = embedding_increment(
            ray.data.from_arrow(_vecs_table(new_ids[:2], new[:2])), state
        )
        inc2 = embedding_increment(
            ray.data.from_arrow(_vecs_table(new_ids[2:], new[2:])), state
        )
        full = embedding_cosine_dedup(
            ray.data.from_arrow(
                pa.concat_tables([_vecs_table(old_ids, old), _vecs_table(new_ids, new)])
            ),
            threshold=THRESH,
        )
        assert _state_clusters(state, inc2.state_version) == _nontrivial(full)
        assert inc2.state_version == inc1.state_version + 1

    def test_forced_distributed_matches(self, tmp_path):
        old_ids, old, new_ids, new = _corpus()
        full = embedding_cosine_dedup(
            ray.data.from_arrow(
                pa.concat_tables([_vecs_table(old_ids, old), _vecs_table(new_ids, new)])
            ),
            threshold=THRESH,
        )
        state = str(tmp_path / "state")
        embedding_bootstrap(
            ray.data.from_arrow(_vecs_table(old_ids, old)), state,
            threshold=THRESH, driver_threshold=0,
        )
        inc = embedding_increment(
            ray.data.from_arrow(_vecs_table(new_ids, new)), state, driver_threshold=0
        )
        assert isinstance(inc.parents, ray.data.Dataset)
        assert _state_clusters(state, inc.state_version) == _nontrivial(full)

    def test_id_validation_and_meta_guard(self, tmp_path):
        old_ids, old, _, _ = _corpus()
        state = str(tmp_path / "state")
        embedding_bootstrap(
            ray.data.from_arrow(_vecs_table(old_ids, old)), state, threshold=THRESH
        )
        with pytest.raises(ValueError, match="max_row_id"):
            embedding_increment(
                ray.data.from_arrow(_vecs_table(old_ids[:2], old[:2])), state
            )
