"""The driver's oracle contract, checked in-repo: every converted query's
DuckDB SQL recomputes the Ray pipeline's exact result on the sf0.001 tables
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"), reason="testdata absent"
)

CONVERTED = [
    "lang_id",
    "ngram_jaccard_dedup",
    "minhash_dedup_docs",
    "minhash_bbit_docs",
    "cluster_cohesion",
    "clustering_ari",
    "simhash_dedup_docs",
    "embedding_cosine_dedup",
    "embedding_cosine_pairs",
    "doc_winnowing_fp",
    "suffix_array_dedup_docs",
    "phash_near_dedup_images",  # corpus-backed; oracle pins the sf0.01 corpus
    "minhash_dedup_images",
    "simhash_dedup_images",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


# image-corpus queries and oracles are both pinned to the gate corpus
# (__ray_entry__._ORACLE_CORPUS_SF) — sf_dir is ignored by construction,
# so no per-query sf override is needed here


@pytest.mark.parametrize("name", CONVERTED)
def test_oracle_matches_pipeline(name, duck):
    import __ray_entry__ as E

    out = E.queries()[name](SF)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    odf = duck.execute(E.oracle_sql()[name]).fetchdf()

    cols = sorted(df.columns)
    assert sorted(odf.columns) == cols
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in cols:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), f"{name}.{c}"
