"""Exact-state content-membership probe: read-only scoring of a new batch
against a saved exact (content-hash -> first-occurrence winner) index.
Parity against DuckDB text-equality joins; the state must not be versioned
by the probe."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.incremental import load_meta
from text_dedup_ray.pipelines.incremental_exact import (
    exact_bootstrap,
    exact_probe_vs_state,
)


def _docs(ids, texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _boot(tmp_path, ids, texts, num_partitions=4):
    state = str(tmp_path / "state")
    exact_bootstrap(
        _docs(ids, texts), state, id_column="doc_id",
        num_partitions=num_partitions,
    )
    return state


def test_matches_duckdb(ray_session, tmp_path):
    import duckdb

    rng = np.random.default_rng(23)
    pool = [f"sentence number {i} of the pool" for i in range(40)]
    old_ids = list(range(1, 101))
    old_texts = [pool[rng.integers(0, 40)] for _ in old_ids]
    new_ids = list(range(101, 161))
    # half redraw from the pool (some seen), half genuinely fresh
    new_texts = [
        pool[rng.integers(0, 40)] if i % 2 == 0 else f"fresh text {i}"
        for i in new_ids
    ]
    state = _boot(tmp_path, old_ids, old_texts)
    got = (
        exact_probe_vs_state(_docs(new_ids, new_texts), state)
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
        """
WITH old AS (SELECT text, min(doc_id) AS winner FROM documents
             WHERE doc_id <= 100 GROUP BY text)
SELECT d.doc_id AS row_id, (o.winner IS NOT NULL) AS seen,
       coalesce(o.winner, -1)::BIGINT AS winner
FROM documents d LEFT JOIN old o USING (text)
WHERE d.doc_id > 100 ORDER BY row_id
"""
    ).fetch_df()
    con.close()
    assert got["row_id"].tolist() == want["row_id"].tolist()
    assert got["seen"].tolist() == want["seen"].tolist()
    assert got["winner"].tolist() == want["winner"].astype(int).tolist()
    assert got["seen"].any() and not got["seen"].all()


def test_probe_is_read_only_and_shape(ray_session, tmp_path):
    state = _boot(tmp_path, [1, 2, 3], ["aaa", "bbb", "aaa"])
    meta_before = load_meta(state)
    out = (
        exact_probe_vs_state(_docs([10, 11], ["aaa", "zzz"]), state)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    assert out["row_id"].tolist() == [10, 11]
    assert out["seen"].tolist() == [True, False]
    assert out["winner"].tolist() == [1, -1]  # first occurrence wins
    assert load_meta(state) == meta_before  # no version bump, pure read


def test_empty_probe_and_partition_invariance(ray_session, tmp_path):
    ids = list(range(1, 31))
    texts = [f"text {i % 7}" for i in ids]
    state = _boot(tmp_path, ids[:20], texts[:20], num_partitions=3)
    empty = exact_probe_vs_state(_docs([], []), state).to_pandas()
    assert len(empty) == 0
    a = (
        exact_probe_vs_state(_docs(ids[20:], texts[20:]), state)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    b = (
        exact_probe_vs_state(_docs(ids[20:], texts[20:]).repartition(5), state)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    assert a.values.tolist() == b.values.tolist()
    assert a["seen"].all()  # texts cycle mod 7, all seen in the first 20


def test_rejects_wrong_state(ray_session, tmp_path):
    from text_dedup_ray.pipelines.incremental_jaccard import jaccard_bootstrap

    s = str(tmp_path / "jac")
    jaccard_bootstrap(
        _docs([1], ["alpha beta"]), s, id_column="doc_id",
        ngram_size=2, min_length=0, threshold=0.6, num_partitions=2,
        df_cap=10,
    )
    with pytest.raises(ValueError, match="not an exact content-hash index"):
        exact_probe_vs_state(_docs([2], ["y"]), s)
