"""Tiered bottom-k sample state: the deterministic bottom-k-by-hash sample
(the approx_quantiles substrate) is exactly mergeable — the bottom-k of a
union is the bottom-k of the merged bottom-ks — so bootstrap + increment and
state union are BIT-identical to a full re-run, at k-rows state cost."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.incremental_sketch import (
    bottomk_state_bootstrap,
    bottomk_state_increment,
    bottomk_state_quantiles,
    bottomk_state_sample,
    bottomk_state_union,
)


def _rows(ids, vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(vals, pa.int64()),
            }
        )
    )


def _sample_rows(state):
    t = bottomk_state_sample(state)
    return list(zip(t["i"].to_pylist(), t["v"].to_pylist()))


def test_increment_equals_full_rerun(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    ids = list(range(1, 501))
    vals = rng.integers(1, 10_000, 500).tolist()
    s_inc, s_full = str(tmp_path / "inc"), str(tmp_path / "full")
    v = bottomk_state_bootstrap(
        _rows(ids[:300], vals[:300]), s_inc, "n_chars", "doc_id", k=64,
        salt="q:",
    )
    assert v == 1
    assert bottomk_state_increment(_rows(ids[300:], vals[300:]), s_inc) == 2
    bottomk_state_bootstrap(
        _rows(ids, vals), s_full, "n_chars", "doc_id", k=64, salt="q:"
    )
    assert _sample_rows(s_inc) == _sample_rows(s_full)
    qi = bottomk_state_quantiles(s_inc, {"p50": 0.5, "p90": 0.9})
    qf = bottomk_state_quantiles(s_full, {"p50": 0.5, "p90": 0.9})
    assert qi.to_pydict() == qf.to_pydict()
    # sample-quantile sanity: p50 of a uniform[1,10k] draw
    p50 = qi["p50"][0].as_py()
    assert 2_500 < p50 < 7_500


def test_union_equals_full_bootstrap(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    ids = list(range(1, 401))
    vals = rng.integers(1, 1000, 400).tolist()
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    bottomk_state_bootstrap(_rows(ids[:150], vals[:150]), sa, "n_chars",
                            "doc_id", k=32)
    bottomk_state_bootstrap(_rows(ids[150:], vals[150:]), sb, "n_chars",
                            "doc_id", k=32)
    assert bottomk_state_union(sa, sb, su) == 1
    bottomk_state_bootstrap(_rows(ids, vals), sf, "n_chars", "doc_id", k=32)
    assert _sample_rows(su) == _sample_rows(sf)


def test_kway_union_and_chained_increment(ray_session, tmp_path):
    ids = list(range(1, 301))
    vals = [(i * 37) % 997 + 1 for i in ids]
    states = []
    for j in range(3):
        s = str(tmp_path / f"s{j}")
        bottomk_state_bootstrap(
            _rows(ids[j * 100:(j + 1) * 100], vals[j * 100:(j + 1) * 100]),
            s, "n_chars", "doc_id", k=16,
        )
        states.append(s)
    su = str(tmp_path / "u")
    bottomk_state_union(states[0], states[1:], su)
    # the union is a normal tiered state: increment chains on it
    extra_ids, extra_vals = list(range(301, 361)), [7] * 60
    assert bottomk_state_increment(_rows(extra_ids, extra_vals), su) == 2
    sf = str(tmp_path / "f")
    bottomk_state_bootstrap(
        _rows(ids + extra_ids, vals + extra_vals), sf, "n_chars", "doc_id",
        k=16,
    )
    assert _sample_rows(su) == _sample_rows(sf)


def test_sample_matches_sql_hash_order(ray_session, tmp_path):
    """The persisted sample is SQL-recomputable: ORDER BY the same md5
    hash expression LIMIT k over the full input."""
    import duckdb

    from text_dedup_ray.pipelines.sample import HASH_U32_SQL

    ids = list(range(1, 201))
    vals = [(i * 13) % 509 for i in ids]
    s = str(tmp_path / "s")
    bottomk_state_bootstrap(_rows(ids[:120], vals[:120]), s, "n_chars",
                            "doc_id", k=24, salt="x:")
    bottomk_state_increment(_rows(ids[120:], vals[120:]), s)
    h = HASH_U32_SQL.format(expr="'x:' || doc_id::VARCHAR")
    con = duckdb.connect()
    con.register("t", pa.table({"doc_id": pa.array(ids, pa.int64()),
                                "n_chars": pa.array(vals, pa.int64())}))
    want = con.execute(
        f"SELECT doc_id, n_chars FROM t ORDER BY ({h}), doc_id LIMIT 24"
    ).fetchall()
    con.close()
    assert _sample_rows(s) == [(i, float(v)) for i, v in want]


def test_config_mismatch_and_wrong_algo(ray_session, tmp_path):
    sa, sb = str(tmp_path / "a"), str(tmp_path / "b")
    bottomk_state_bootstrap(_rows([1], [2]), sa, "n_chars", "doc_id", k=8)
    bottomk_state_bootstrap(_rows([1], [2]), sb, "n_chars", "doc_id", k=16)
    with pytest.raises(ValueError, match="cfg_hash mismatch"):
        bottomk_state_union(sa, sb, str(tmp_path / "u"))
    from text_dedup_ray.pipelines.incremental_sketch import hll_state_bootstrap

    sh = str(tmp_path / "hll")
    hll_state_bootstrap(_rows([1], [2]), sh, "doc_id")
    with pytest.raises(ValueError, match="not a bottomk_sketch state"):
        bottomk_state_increment(_rows([2], [3]), sh)


def test_fsck_covers_bottomk_state(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from text_dedup_ray.pipelines.incremental_sketch import _registers_path
    from text_dedup_ray.state.fsck import check_state

    s = str(tmp_path / "s")
    bottomk_state_bootstrap(_rows(list(range(50)), [1] * 50), s, "n_chars",
                            "doc_id", k=8)
    rep = check_state(s)
    assert rep["ok"], rep["errors"]
    # corrupt: sample larger than k must be flagged
    t = pq.read_table(_registers_path(s, 1))
    pq.write_table(pa.concat_tables([t, t]), _registers_path(s, 1))
    rep = check_state(s)
    assert not rep["ok"]
    assert any("rows > k" in e for e in rep["errors"])
