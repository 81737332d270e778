"""compact_state: fold additive-family cluster history into one snapshot.

The additive-cluster families (exact + *_posting) store only the ingesting
batch's assignments in each version's clusters dir, so a bare
prune_state_versions(keep_last=1) drops history. compact_state must:
(a) preserve the UNION of cluster rows across all versions, byte-for-byte;
(b) leave exactly one version dir (the current one);
(c) keep the state fully usable — increments and probes after compaction
    behave identically to the uncompacted chain;
(d) reduce to a plain prune for the snapshot families (minhash);
(e) pass check_state fsck afterwards.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.incremental import (
    compact_state,
    load_meta,
    minhash_bootstrap,
    minhash_increment,
)
from text_dedup_ray.pipelines.incremental_exact import (
    exact_bootstrap,
    exact_increment,
    exact_probe_vs_state,
)
from text_dedup_ray.pipelines.incremental_jaccard import (
    jaccard_bootstrap,
    jaccard_increment,
)
from text_dedup_ray.state.fsck import check_state


def _docs(ids, texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )


def _versions(state):
    return sorted(
        int(d[1:])
        for d in os.listdir(state)
        if d.startswith("v") and d[1:].isdigit()
    )


def _cluster_rows(state):
    rows = set()
    for f in glob.glob(os.path.join(state, "v*", "clusters", "*.parquet")):
        t = pq.read_table(f, columns=["row_id", "cluster_id"])
        rows.update(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))
    return rows


def test_compact_exact_preserves_history_and_stays_usable(tmp_path):
    state = str(tmp_path / "ex")
    t0 = [f"alpha {i} beta gamma delta" for i in range(12)]
    t1 = [t0[3], t0[7], "fresh one two three four"]  # two dups of the old batch
    t2 = [t0[5], t1[2], "another new doc entirely here"]  # dups of both tiers
    exact_bootstrap(_docs(range(12), t0), state, id_column="doc_id", num_partitions=4)
    exact_increment(_docs([100, 101, 102], t1), state, id_column="doc_id")
    assert _versions(state) == [1, 2]

    before = _cluster_rows(state)
    assert before  # the increment planted real duplicate rows

    report = compact_state(state)
    assert report["algo"] == "exact"
    assert report["version"] == 2
    assert report["folded"] == [1]
    assert _versions(state) == [2]
    assert load_meta(state)["version"] == 2
    # history preserved exactly
    assert _cluster_rows(state) == before
    fsck = check_state(state)
    assert fsck["ok"], fsck["errors"]

    # still usable: a post-compaction increment finds dups in BOTH tiers
    inc = exact_increment(_docs([200, 201, 202], t2), state, id_column="doc_id")
    assert inc.state_version == 3
    after = _cluster_rows(state)
    assert (200, 5) in after  # dup of bootstrap doc 5 (winner = min row_id)
    assert (201, 102) in after  # dup of increment-1 doc 102
    assert before <= after

    # probes agree with a never-compacted twin state
    twin = str(tmp_path / "twin")
    exact_bootstrap(_docs(range(12), t0), twin, id_column="doc_id", num_partitions=4)
    exact_increment(_docs([100, 101, 102], t1), twin, id_column="doc_id")
    exact_increment(_docs([200, 201, 202], t2), twin, id_column="doc_id")
    assert _cluster_rows(state) == _cluster_rows(twin)
    probe_ds = _docs([300, 301], [t0[3], "never seen text at all"])
    got = exact_probe_vs_state(probe_ds, state).to_pandas().sort_values("row_id")
    want = exact_probe_vs_state(probe_ds, twin).to_pandas().sort_values("row_id")
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_compact_posting_family(tmp_path):
    state = str(tmp_path / "jac")
    t0 = [f"one two three four five token{i} token{i + 1}" for i in range(10)]
    t1 = [t0[2] + " six", "unrelated words entirely different here"]
    jaccard_bootstrap(
        _docs(range(10), t0), state, id_column="doc_id",
        ngram_size=2, min_length=0, threshold=0.5, num_partitions=4,
        df_cap=1_000_000_000,
    )
    jaccard_increment(_docs([50, 51], t1), state, id_column="doc_id")
    before = _cluster_rows(state)
    # near-dup of old doc 2 landed in the increment dir (root = cluster min)
    assert any(r == 50 for r, _c in before)

    report = compact_state(state)
    assert report["algo"].endswith("_posting")
    assert _versions(state) == [load_meta(state)["version"]]
    assert _cluster_rows(state) == before
    fsck = check_state(state)
    assert fsck["ok"], fsck["errors"]


def test_compact_snapshot_family_is_a_prune(tmp_path):
    state = str(tmp_path / "mh")
    cfg = MinHashConfig(
        num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1", seed=42
    )
    texts = [f"aaa bbb ccc ddd eee fff{i}" for i in range(8)]
    minhash_bootstrap(
        _docs(range(8), texts), state, cfg=cfg, id_column="doc_id", num_partitions=4
    )
    minhash_increment(
        _docs([20, 21], [texts[0], "zzz yyy xxx www vvv uuu"]),
        state, cfg=cfg, id_column="doc_id",
    )
    before = _cluster_rows(state)  # current version already carries the full map
    report = compact_state(state)
    assert report["folded"] == []  # nothing additive to fold
    assert report["pruned"] == [1]
    assert _versions(state) == [2]
    assert _cluster_rows(state) == before
    assert check_state(state)["ok"]


def test_compact_is_idempotent(tmp_path):
    state = str(tmp_path / "ex2")
    texts = ["same doc text here twice", "same doc text here twice", "other"]
    exact_bootstrap(_docs(range(3), texts), state, id_column="doc_id", num_partitions=2)
    exact_increment(_docs([10], ["same doc text here twice"]), state, id_column="doc_id")
    before = _cluster_rows(state)
    compact_state(state)
    mid = _cluster_rows(state)
    r2 = compact_state(state)
    assert r2["folded"] == [] and r2["pruned"] == []
    assert _cluster_rows(state) == mid == before
