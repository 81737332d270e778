"""Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-Res top-k).

DuckDB parity: the oracle recomputes the exact same ES key
``ln((md5_63(salt||id)::DOUBLE + 0.5) / 2^63) / weight`` and takes the
same top-k — both engines run libm doubles over identical inputs, and the
test asserts the SELECTION matches exactly (plus a bitwise key spot-check
so a ulp drift between numpy's vectorized log and DuckDB's would surface
here before it could ever flip a gate run).
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from text_dedup_ray.pipelines.sample import HASH_U63_SQL, weighted_reservoir_topk


def _corpus(n: int = 300) -> pa.Table:
    rng = np.random.default_rng(7)
    ids = np.arange(1, n + 1, dtype=np.int64)
    w = rng.integers(1, 5000, size=n).astype(np.int64)
    return pa.table({"doc_id": ids, "n_chars": w})


def _oracle(tbl: pa.Table, k: int, salt: str) -> list[int]:
    h = HASH_U63_SQL.format(expr=f"'{salt}' || doc_id::VARCHAR")
    con = duckdb.connect()
    con.register("t", tbl)
    out = con.execute(
        f"""
        SELECT doc_id
        FROM (
          SELECT doc_id,
                 ln((({h})::DOUBLE + 0.5) / 9223372036854775808.0)
                   / n_chars AS es_key
          FROM t
        )
        ORDER BY es_key DESC, doc_id
        LIMIT {k}
        """
    ).fetchall()
    con.close()
    return sorted(r[0] for r in out)


def test_selection_matches_duckdb(ray_session):
    tbl = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(6)
    got = weighted_reservoir_topk(
        ds, id_key="doc_id", weight_column="n_chars", k=40, salt="wtk"
    )
    ours = sorted(got.to_pandas()["doc_id"].tolist())
    assert ours == _oracle(tbl, 40, "wtk")


def test_keys_bitwise_equal_duckdb(ray_session):
    """Engine ES keys == DuckDB ES keys BITWISE for every row (not just the
    selected set) — the strongest guard against libm-vs-numpy log drift."""
    tbl = _corpus(128)
    ds = ray.data.from_arrow(tbl)
    got = weighted_reservoir_topk(
        ds, id_key="doc_id", weight_column="n_chars", k=128, salt="s",
        key_alias="es_key",
    ).to_pandas().sort_values("doc_id")
    h = HASH_U63_SQL.format(expr=f"'s' || doc_id::VARCHAR")
    con = duckdb.connect()
    con.register("t", tbl)
    theirs = con.execute(
        f"""SELECT doc_id,
                   ln((({h})::DOUBLE + 0.5) / 9223372036854775808.0)
                     / n_chars AS es_key
            FROM t ORDER BY doc_id"""
    ).fetch_df()
    con.close()
    a = got["es_key"].to_numpy()
    b = theirs["es_key"].to_numpy()
    assert np.array_equal(
        a.view(np.uint64), b.view(np.uint64)
    ), "ES keys drifted between numpy and DuckDB libm"


def test_heavier_rows_win_more(ray_session):
    """Statistical sanity: with weights 1 vs 100, the heavy half dominates
    the sample (ES property, deterministic given the salt)."""
    n = 400
    ids = np.arange(1, n + 1, dtype=np.int64)
    w = np.where(ids <= n // 2, 1, 100).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "n_chars": w}))
    got = weighted_reservoir_topk(
        ds, id_key="doc_id", weight_column="n_chars", k=50, salt="bias"
    ).to_pandas()
    heavy = int((got["doc_id"] > n // 2).sum())
    assert heavy >= 45


def test_k_exceeding_rows_returns_all(ray_session):
    tbl = _corpus(10)
    ds = ray.data.from_arrow(tbl)
    got = weighted_reservoir_topk(
        ds, id_key="doc_id", weight_column="n_chars", k=50, salt=""
    )
    assert got.count() == 10


def test_nonpositive_weight_raises(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "n_chars": pa.array([5, 0], pa.int64())}
    )
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="weight"):
        weighted_reservoir_topk(
            ds, id_key="doc_id", weight_column="n_chars", k=1, salt=""
        ).materialize()
