"""prune_state_versions: GC of superseded tiered-index snapshots.

Each version dir is self-contained and only the meta.json version is ever
read by the next increment, so pruning must (a) remove exactly the versions
older than keep_last, (b) never touch the current version or anything newer
than meta (in-flight workspace), and (c) leave the state fully usable — an
increment after pruning still equals the full batch re-run."""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.incremental import (
    load_meta,
    minhash_bootstrap,
    minhash_increment,
    prune_state_versions,
)
from text_dedup_ray.pipelines.minhash import minhash_dedup


def _cfg():
    return MinHashConfig(
        num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1", seed=42
    )


def _docs(ids, texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )


def _texts(seed, n):
    import random

    rng = random.Random(seed)
    vocab = [f"w{c}" for c in range(300)]
    return [" ".join(rng.choice(vocab) for _ in range(15)) for _ in range(n)]


def _versions(state):
    return sorted(
        int(d[1:]) for d in os.listdir(state)
        if d.startswith("v") and d[1:].isdigit()
    )


def test_prune_keeps_current_and_state_stays_usable(tmp_path):
    state = str(tmp_path / "st")
    t0 = _texts(1, 20)
    t1 = _texts(2, 6)
    t2 = list(_texts(3, 5)) + [t0[4]]  # increment 2 contains a dup of old id 4
    minhash_bootstrap(
        _docs(range(20), t0), state, cfg=_cfg(), id_column="doc_id",
        num_partitions=4,
    )
    minhash_increment(
        _docs(range(100, 106), t1), state, cfg=_cfg(), id_column="doc_id"
    )
    assert _versions(state) == [1, 2]

    removed = prune_state_versions(state, keep_last=1)
    assert removed == [1]
    assert _versions(state) == [2]
    assert load_meta(state)["version"] == 2

    # state still usable: a third increment equals the full batch re-run
    inc = minhash_increment(
        _docs(range(200, 206), t2), state, cfg=_cfg(), id_column="doc_id"
    )
    assert inc.state_version == 3
    full = minhash_dedup(
        _docs(
            list(range(20)) + list(range(100, 106)) + list(range(200, 206)),
            t0 + t1 + t2,
        ),
        id_column="doc_id",
        cfg=_cfg(),
    )
    inc_surv = sorted(r["doc_id"] for r in inc.deduped.take_all())
    full_surv = sorted(
        r["doc_id"] for r in full.deduped.take_all() if r["doc_id"] >= 200
    )
    assert inc_surv == full_surv


def test_prune_keep_last_n_and_inflight_untouched(tmp_path):
    state = str(tmp_path / "st")
    minhash_bootstrap(
        _docs(range(12), _texts(5, 12)), state, cfg=_cfg(), id_column="doc_id",
        num_partitions=2,
    )
    for k in range(2):
        minhash_increment(
            _docs(range(100 + 10 * k, 104 + 10 * k), _texts(6 + k, 4)),
            state, cfg=_cfg(), id_column="doc_id",
        )
    assert _versions(state) == [1, 2, 3]
    # a dir NEWER than meta = in-flight increment workspace -> never pruned
    os.makedirs(os.path.join(state, "v00007"))

    removed = prune_state_versions(state, keep_last=2)
    assert removed == [1]
    assert _versions(state) == [2, 3, 7]

    # keep_last < 1 clamps to 1 (current version always survives)
    removed = prune_state_versions(state, keep_last=0)
    assert removed == [2]
    assert _versions(state) == [3, 7]

    # idempotent
    assert prune_state_versions(state, keep_last=1) == []


def test_rollback_restores_meta_and_reingests_same_ids(tmp_path):
    from text_dedup_ray.pipelines.incremental import rollback_state

    state = str(tmp_path / "st")
    t0 = _texts(8, 15)
    bad = _texts(9, 5)
    minhash_bootstrap(
        _docs(range(15), t0), state, cfg=_cfg(), id_column="doc_id",
        num_partitions=4,
    )
    meta_v1 = load_meta(state)
    inc_bad = minhash_increment(
        _docs(range(100, 105), bad), state, cfg=_cfg(), id_column="doc_id"
    )
    assert inc_bad.state_version == 2
    bad_surv = sorted(r["doc_id"] for r in inc_bad.deduped.take_all())

    removed = rollback_state(state, 1)
    assert removed == [2]
    assert load_meta(state) == meta_v1  # version AND max_row_id rewound
    assert _versions(state) == [1]

    # the rolled-back batch's ids are ingestible again, same result
    redo = minhash_increment(
        _docs(range(100, 105), bad), state, cfg=_cfg(), id_column="doc_id"
    )
    assert redo.state_version == 2
    assert sorted(r["doc_id"] for r in redo.deduped.take_all()) == bad_surv


def test_rollback_errors(tmp_path):
    import pytest

    from text_dedup_ray.pipelines.incremental import (
        prune_state_versions,
        rollback_state,
    )

    state = str(tmp_path / "st")
    minhash_bootstrap(
        _docs(range(10), _texts(10, 10)), state, cfg=_cfg(), id_column="doc_id",
        num_partitions=2,
    )
    minhash_increment(
        _docs(range(100, 103), _texts(11, 3)), state, cfg=_cfg(), id_column="doc_id"
    )
    # nonexistent target -> sidecar error
    with pytest.raises(ValueError, match="pruned, never written"):
        rollback_state(state, 9)
    # a NEWER dir with a sidecar (crash leftover) still refuses to roll forward
    import json as _json

    os.makedirs(os.path.join(state, "v00009"))
    with open(os.path.join(state, "v00009", "meta.json"), "w") as fh:
        _json.dump({"version": 9}, fh)
    with pytest.raises(ValueError, match="roll FORWARD"):
        rollback_state(state, 9)
    import shutil as _shutil

    _shutil.rmtree(os.path.join(state, "v00009"))
    prune_state_versions(state, keep_last=1)  # v1 gone
    with pytest.raises(ValueError, match="pruned, never written"):
        rollback_state(state, 1)
