"""corpus.doc_shingle_novelty: DuckDB parity (bit-identical novelty),
partition invariance, degenerate corpora (identical docs, unique doc,
short docs, empty input)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.corpus import doc_shingle_novelty

NOVELTY_SQL = """
WITH tk AS (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM t),
w AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 2),
             j -> array_to_string(ts[j:j+2], ' '))) AS g
      FROM tk WHERE len(ts) >= 3),
d AS (SELECT DISTINCT doc_id, g FROM w),
df AS (SELECT g, count(*)::BIGINT AS nd FROM d GROUP BY g)
SELECT d.doc_id,
       count(*)::BIGINT AS n_distinct,
       sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       1.0 - (sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END)::DOUBLE
              / count(*)) AS novelty
FROM d JOIN df USING (g) GROUP BY d.doc_id ORDER BY d.doc_id
"""


def _corpus(seed: int = 11, n: int = 200) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = ["spark", "ray", "data", "join", "sort", "hash", "merge", "scan"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 15))))
        for _ in range(n)
    ]
    # plant exact duplicates and one guaranteed-unique doc
    texts[10] = texts[20] = texts[30] = "alpha beta gamma delta epsilon"
    texts[40] = "zzz_unique_one zzz_unique_two zzz_unique_three zzz_unique_four"
    return pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": texts}
    )


def _run(t: pa.Table, num_partitions: int = 5):
    got = (
        doc_shingle_novelty(
            ray.data.from_arrow(t), ngram=3, num_partitions=num_partitions
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return got


def test_novelty_matches_duckdb():
    t = _corpus()
    got = _run(t)
    exp = duckdb.sql(NOVELTY_SQL).fetchdf()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_distinct"].tolist() == exp["n_distinct"].tolist()
    assert got["n_shared"].tolist() == exp["n_shared"].tolist()
    # one divide + subtract on the same exact ints: bit-identical doubles
    assert got["novelty"].tolist() == exp["novelty"].tolist()


def test_novelty_partition_invariance():
    t = _corpus(seed=23)
    a = _run(t, num_partitions=1)
    b = _run(t, num_partitions=7)
    assert a.values.tolist() == b.values.tolist()


def test_novelty_degenerate_docs():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [
                "one two three four five",   # identical pair -> novelty 0
                "one two three four five",
                "wholly distinct text of doc two here",  # unique -> 1.0
                "too short",                 # < ngram tokens -> absent
                "",                          # empty -> absent
            ],
        }
    )
    got = _run(t).set_index("doc_id")
    assert sorted(got.index.tolist()) == [0, 1, 2]
    assert got.loc[0, "novelty"] == 0.0
    assert got.loc[1, "novelty"] == 0.0
    assert got.loc[2, "novelty"] == 1.0
    assert got.loc[2, "n_shared"] == 0


def test_novelty_empty_input():
    t = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    out = doc_shingle_novelty(ray.data.from_arrow(t))
    assert out.count() == 0
    # ray's to_pandas drops columns for all-empty datasets; the blocks
    # themselves carry the contract schema
    assert out.schema().base_schema.names == [
        "doc_id", "n_distinct", "n_shared", "novelty",
    ]
