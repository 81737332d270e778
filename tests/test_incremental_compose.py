"""Regression tests for the incremental compose path (round-3 fixes).

1. ADVICE r2 medium: the Dataset-backed (forced-distributed) compose branch
   must also resolve old nodes that appear ONLY in the cluster_id column —
   include_roots=False maps (SimHash) omit root self-rows, so an old
   non-root member acting as a (bucket, sig) rep used to escape composition
   through its prior root.
2. Transitive bridging: two CC components that share no new edge but touch
   members of the same prior cluster must merge (chained through that
   shared root) exactly as a full re-run would — per-component min is not
   enough, the compose runs a union-find.
3. The SimHash incremental cross-compare is restricted to (new x all):
   old-old pairs are not re-emitted, and cap truncation keeps new sigs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from text_dedup_ray.pipelines.incremental import _compose_with_prior
from text_dedup_ray.stages.edges import simhash_distinct_sig_edges


def _write_prior(tmp_path, rows: dict[int, int]) -> str:
    d = str(tmp_path / "clusters")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "row_id": pa.array(list(rows.keys()), pa.int64()),
                "cluster_id": pa.array(list(rows.values()), pa.int64()),
            }
        ),
        os.path.join(d, "new-00000.parquet"),
    )
    return d


def _cc_dataset(pairs: dict[int, int]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "row_id": pa.array(list(pairs.keys()), pa.int64()),
                "cluster_id": pa.array(list(pairs.values()), pa.int64()),
            }
        )
    )


def _collect(ds: ray.data.Dataset) -> dict[int, int]:
    t = ds.to_pandas()
    return dict(zip(t["row_id"].astype(int), t["cluster_id"].astype(int)))


class TestComposeDatasetBranch:
    def test_old_root_only_in_cluster_id(self, tmp_path):
        """ADVICE repro: prior cluster {1,5} (5->1); new edge (100,5) makes 5
        a CC root that appears only in cluster_id (include_roots=False). The
        composed map must send 100 through 5's prior root 1."""
        prior = _write_prior(tmp_path, {5: 1})
        cc = _cc_dataset({100: 5})
        composed, merges = _compose_with_prior(cc, prior_max=50, prior_clusters_dir=prior)
        assert _collect(composed) == {100: 1}
        assert merges == {}

    def test_dict_and_dataset_paths_agree(self, tmp_path):
        prior = _write_prior(tmp_path, {5: 1, 8: 2})
        cc_pairs = {100: 5, 101: 8, 5: 5, 8: 8}  # dict path includes roots
        d_composed, d_merges = _compose_with_prior(
            dict(cc_pairs), prior_max=50, prior_clusters_dir=prior
        )
        ds_composed, ds_merges = _compose_with_prior(
            _cc_dataset({100: 5, 101: 8}),  # include_roots=False shape
            prior_max=50,
            prior_clusters_dir=prior,
        )
        got = _collect(ds_composed)
        assert got[100] == d_composed[100] == 1
        assert got[101] == d_composed[101] == 2
        assert d_merges == ds_merges == {}

    def test_transitive_bridge_chains_merge(self, tmp_path):
        """Components A={100,1,11} and B={101,12,21} share NO new edge but
        both touch prior cluster u={10,11,12}; prior t={0,1}, v={20,21}.
        Full-rerun connectivity merges t,u,v into root 0 — the compose must
        chain the merges (the old per-component min left B rooted at 10)."""
        prior = _write_prior(tmp_path, {1: 0, 11: 10, 12: 10, 21: 20})
        cc_pairs = {100: 1, 1: 1, 11: 1, 101: 12, 12: 12, 21: 12}
        composed, merges = _compose_with_prior(
            dict(cc_pairs), prior_max=50, prior_clusters_dir=prior
        )
        assert set(composed.values()) == {0}
        assert merges == {10: 0, 20: 0}

        ds_composed, ds_merges = _compose_with_prior(
            _cc_dataset({100: 1, 11: 1, 101: 12, 21: 12}),
            prior_max=50,
            prior_clusters_dir=prior,
        )
        got = _collect(ds_composed)
        assert set(got.values()) == {0}
        assert ds_merges == {10: 0, 20: 0}


class TestSimHashNewMaskCompare:
    def _mat(self, sigs: list[int]) -> np.ndarray:
        """(n, 20) key matrix, all rows in one bucket (prefix zeros)."""
        mat = np.zeros((len(sigs), 20), dtype=np.uint8)
        mat[:, 12:] = (
            np.array(sigs, dtype=np.uint64).view(np.uint8).reshape(-1, 8)
        )
        return mat

    def _edges(self, out) -> set[tuple[int, int]]:
        src, dst = out
        pairs = set()
        for a, b in zip(src, dst):
            pairs.update(zip(a.tolist(), b.tolist()))
        return pairs

    def test_old_old_pairs_skipped(self):
        # sigs 0 and 1 differ by 1 bit but both are OLD -> no edge;
        # new sig (id 100) is 1 bit from old sig 0 -> edge (100, 0)
        sigs = [0b0, 0b1, 0b1111000011110000]
        ids = np.array([0, 1, 100], dtype=np.int64)
        new_mask = np.array([False, False, True])
        mat = self._mat(sigs)
        got = self._edges(
            simhash_distinct_sig_edges(mat, ids, 3, 8192, new_mask=new_mask)
        )
        assert got == set()  # new sig is far from both old sigs

        sigs = [0b0, 0b1, 0b10]  # new sig 0b10 is 1 bit from 0, 2 bits from 1
        mat = self._mat(sigs)
        got = self._edges(
            simhash_distinct_sig_edges(mat, ids, 3, 8192, new_mask=new_mask)
        )
        assert got == {(100, 0), (100, 1)}  # no (1, 0) old-old edge

    def test_all_new_equals_no_mask(self):
        rng = np.random.default_rng(3)
        sigs = rng.integers(0, 2**63, size=32, dtype=np.int64).astype(np.uint64)
        sigs[5] = sigs[2] ^ np.uint64(1)  # plant a close pair
        ids = np.arange(32, dtype=np.int64)
        mat = self._mat(sigs.tolist())
        plain = self._edges(simhash_distinct_sig_edges(mat, ids, 3, 8192))
        masked = self._edges(
            simhash_distinct_sig_edges(
                mat, ids, 3, 8192, new_mask=np.ones(32, dtype=bool)
            )
        )
        assert plain == masked and (5, 2) in plain

    def test_truncation_keeps_new_sigs(self):
        # 10 old sigs (ids 0..9), 1 new sig near old id 2's sig; cap 4.
        # The old unmasked truncation (smallest ids win) would evict the NEW
        # sig entirely; the masked path keeps it and still finds (100, 2).
        old_sigs = [np.uint64(1) << np.uint64(6 * i) for i in range(10)]
        new_sig = old_sigs[2] ^ np.uint64(1 << 32)
        sigs = [int(s) for s in old_sigs] + [int(new_sig)]
        ids = np.array(list(range(10)) + [100], dtype=np.int64)
        new_mask = np.array([False] * 10 + [True])
        mat = self._mat(sigs)
        got = self._edges(
            simhash_distinct_sig_edges(mat, ids, 3, 4, new_mask=new_mask)
        )
        assert (100, 2) in got
        assert all(a == 100 for a, _ in got)  # only new-x-old edges emitted
