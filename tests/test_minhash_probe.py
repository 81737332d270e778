"""MinHash-state LSH candidate probe: read-only scoring of a new batch
against a saved rep index — per new row, how many band keys collide with an
indexed bucket and the smallest colliding representative. Parity against
the md5-recompute DuckDB oracle; the state must not be versioned."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.incremental import (
    load_meta,
    minhash_bootstrap,
    minhash_probe_vs_state,
)

CFG = dict(num_perm=32, bands=8, rows=4, ngram_size=2, min_length=0, hash_func="md5")


def _docs(ids, texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _boot(tmp_path, ids, texts, **over):
    state = str(tmp_path / "state")
    minhash_bootstrap(
        _docs(ids, texts), state, cfg=MinHashConfig(**{**CFG, **over}),
        id_column="doc_id", num_partitions=4,
    )
    return state


def test_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from text_dedup_ray.oracles import _minhash_bands_core

    rng = np.random.default_rng(31)
    vocab = [f"tok{i}" for i in range(50)]
    old_ids = list(range(1, 81))
    old_texts = [" ".join(rng.choice(vocab, 12)) for _ in old_ids]
    new_ids = list(range(81, 121))
    # mix of near-copies of old docs (high collision) and fresh text
    new_texts = [
        (old_texts[(i * 7) % 80] + " tail") if i % 2 == 0
        else " ".join(f"zz{i}_{j}" for j in range(12))
        for i in new_ids
    ]
    cfg = MinHashConfig(**CFG)
    state = _boot(tmp_path, old_ids, old_texts)
    got = (
        minhash_probe_vs_state(_docs(new_ids, new_texts), state, cfg=cfg)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(old_ids + new_ids, pa.int64()),
                "text": pa.array(old_texts + new_texts, pa.string()),
            }
        ),
    )
    want = con.execute(
        f"""
WITH {_minhash_bands_core(cfg, "documents")},
oldb AS (SELECT band_idx, band_val, min(doc_id) AS rep FROM bands
         WHERE doc_id <= 80 GROUP BY 1, 2),
newb AS (SELECT doc_id, band_idx, band_val FROM bands WHERE doc_id > 80)
SELECT n.doc_id AS row_id,
       count(o.rep)::BIGINT AS n_hits,
       (count(o.rep) > 0) AS is_candidate,
       coalesce(min(o.rep), -1)::BIGINT AS candidate_rep
FROM newb n LEFT JOIN oldb o USING (band_idx, band_val)
GROUP BY n.doc_id ORDER BY row_id
"""
    ).fetch_df()
    con.close()
    assert got["row_id"].tolist() == want["row_id"].tolist()
    assert got["n_hits"].tolist() == want["n_hits"].astype(int).tolist()
    assert got["is_candidate"].tolist() == want["is_candidate"].tolist()
    assert got["candidate_rep"].tolist() == want["candidate_rep"].astype(int).tolist()
    # the mix must exercise both branches
    assert got["is_candidate"].any() and not got["is_candidate"].all()


def test_read_only_near_copy_and_fresh(ray_session, tmp_path):
    texts = ["alpha beta gamma delta epsilon zeta eta theta"] * 3
    state = _boot(tmp_path, [1, 2, 3], texts)
    meta_before = load_meta(state)
    out = (
        minhash_probe_vs_state(
            _docs([10, 11], [texts[0], "totally different words everywhere now"]),
            state, cfg=MinHashConfig(**CFG),
        )
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    # exact copy collides in EVERY band with rep=1; fresh doc in none
    assert out["row_id"].tolist() == [10, 11]
    assert out["n_hits"].tolist()[0] == 8
    assert out["candidate_rep"].tolist() == [1, -1]
    assert out["is_candidate"].tolist() == [True, False]
    assert load_meta(state) == meta_before  # pure read


def test_min_length_filter_and_partition_invariance(ray_session, tmp_path):
    state = _boot(tmp_path, [1, 2], ["one two three four five", "six seven eight nine ten"],
                  min_length=3)
    cfg = MinHashConfig(**{**CFG, "min_length": 3})
    probe = _docs([10, 11, 12], ["too short", "one two three four five", "new words beyond anything"])
    a = (
        minhash_probe_vs_state(probe, state, cfg=cfg)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    assert a["row_id"].tolist() == [11, 12]  # sub-min_length doc absent
    b = (
        minhash_probe_vs_state(probe.repartition(5), state, cfg=cfg)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    assert a.values.tolist() == b.values.tolist()


def test_rejects_wrong_cfg_and_state(ray_session, tmp_path):
    state = _boot(tmp_path, [1], ["alpha beta gamma"])
    with pytest.raises(ValueError, match="different MinHash config"):
        minhash_probe_vs_state(
            _docs([2], ["x y z"]), state,
            cfg=MinHashConfig(**{**CFG, "bands": 4}),
        )
    from text_dedup_ray.pipelines.incremental_exact import exact_bootstrap

    s2 = str(tmp_path / "exact")
    exact_bootstrap(_docs([1], ["x"]), s2, id_column="doc_id", num_partitions=2)
    with pytest.raises(ValueError, match="not a minhash LSH state"):
        minhash_probe_vs_state(_docs([2], ["y"]), s2, cfg=MinHashConfig(**CFG))
