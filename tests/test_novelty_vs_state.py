"""Novelty-vs-state: read-only scoring of a new batch against a saved
jaccard posting index — per new row, the fraction of its distinct shingles
NOT already in the index. Parity against a brute-force python recompute and
DuckDB; the state must not be versioned by the probe."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.functions.tokenization import shingle_set
from text_dedup_ray.pipelines.incremental import load_meta
from text_dedup_ray.pipelines.incremental_jaccard import (
    jaccard_bootstrap,
    jaccard_novelty_vs_state,
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


def _boot(tmp_path, old_ids, old_texts, ngram=2, min_length=0):
    state = str(tmp_path / "state")
    jaccard_bootstrap(
        _docs(old_ids, old_texts), state, id_column="doc_id",
        ngram_size=ngram, min_length=min_length, threshold=0.6,
        num_partitions=4, df_cap=1_000_000_000,
    )
    return state


def test_matches_bruteforce_and_duckdb(ray_session, tmp_path):
    import duckdb

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(60)]
    old_ids = list(range(1, 101))
    old_texts = [" ".join(rng.choice(vocab, 8)) for _ in old_ids]
    new_ids = list(range(101, 161))
    # mix: half re-draw from the same vocab (partially seen), half fresh words
    new_texts = [
        " ".join(rng.choice(vocab, 8)) if i % 2 == 0
        else " ".join(f"fresh{i}_{j}" for j in range(8))
        for i in new_ids
    ]
    state = _boot(tmp_path, old_ids, old_texts)
    got = (
        jaccard_novelty_vs_state(_docs(new_ids, new_texts), state)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    # brute force: union of old shingle sets
    old_set = set()
    for t in old_texts:
        old_set |= shingle_set(t, 2, 0)
    for _, r in got.iterrows():
        mine = shingle_set(new_texts[int(r.row_id) - 101], 2, 0)
        seen = len(mine & old_set)
        assert r.n_distinct == len(mine)
        assert r.n_seen == seen
        assert r.novelty == pytest.approx(1.0 - seen / len(mine))
    assert len(got) == len(new_ids)
    # fresh docs are fully novel
    fresh = got[got.row_id % 2 == 1]
    assert (fresh.novelty == 1.0).all()

    # duckdb parity (the gate oracle shape)
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
WITH tko AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
             FROM documents WHERE doc_id <= 100),
og AS (SELECT DISTINCT doc_id, g FROM (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
                 j -> array_to_string(ts[j:j+1], ' '))) AS g
  FROM tko WHERE len(ts) >= 2
  UNION ALL
  SELECT doc_id, array_to_string(ts, ' ') AS g FROM tko
  WHERE len(ts) >= 1 AND len(ts) < 2)),
tkn AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
        FROM documents WHERE doc_id > 100),
ng AS (SELECT DISTINCT doc_id, g FROM (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
                 j -> array_to_string(ts[j:j+1], ' '))) AS g
  FROM tkn WHERE len(ts) >= 2
  UNION ALL
  SELECT doc_id, array_to_string(ts, ' ') AS g FROM tkn
  WHERE len(ts) >= 1 AND len(ts) < 2)),
oset AS (SELECT DISTINCT g FROM og)
SELECT ng.doc_id AS row_id, count(*)::BIGINT AS n_distinct,
       sum(CASE WHEN oset.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_seen,
       1.0 - (sum(CASE WHEN oset.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
              / count(*)) AS novelty
FROM ng LEFT JOIN oset USING (g) GROUP BY ng.doc_id ORDER BY row_id
"""
    ).fetch_df()
    con.close()
    assert got["row_id"].tolist() == want["row_id"].tolist()
    assert got["n_distinct"].tolist() == want["n_distinct"].astype(int).tolist()
    assert got["n_seen"].tolist() == want["n_seen"].astype(int).tolist()
    np.testing.assert_allclose(got["novelty"], want["novelty"])


def test_probe_is_read_only_and_zero_shingle_docs_drop(ray_session, tmp_path):
    state = _boot(tmp_path, [1, 2], ["alpha beta gamma", "beta gamma delta"])
    meta_before = load_meta(state)
    out = jaccard_novelty_vs_state(
        _docs([10, 11, 12], ["alpha beta gamma", "zeta eta theta", "!!!"]),
        state,
    ).to_pandas().sort_values("row_id").reset_index(drop=True)
    # all-seen doc -> novelty 0; all-fresh -> 1; punctuation-only -> absent
    assert out["row_id"].tolist() == [10, 11]
    assert out["novelty"].tolist() == [0.0, 1.0]
    assert load_meta(state) == meta_before  # no version bump, pure read


def test_partition_invariance(ray_session, tmp_path):
    ids = list(range(1, 41))
    texts = [f"doc {i} common tail words here" for i in ids]
    state = _boot(tmp_path, ids[:20], texts[:20])
    a = (
        jaccard_novelty_vs_state(_docs(ids[20:], texts[20:]), state)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    b = (
        jaccard_novelty_vs_state(
            _docs(ids[20:], texts[20:]).repartition(7), state
        )
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    assert a.values.tolist() == b.values.tolist()


def test_rejects_wrong_state(ray_session, tmp_path):
    from text_dedup_ray.pipelines.incremental_sketch import hll_state_bootstrap

    s = str(tmp_path / "hll")
    hll_state_bootstrap(_docs([1], ["x"]), s, "doc_id")
    with pytest.raises(ValueError, match="not a jaccard_posting index"):
        jaccard_novelty_vs_state(_docs([2], ["y"]), s)
