"""Gate smoke: the driver-contract registry (__ray_entry__.queries() /
oracle_sql()) must never break at the registry level again — round 3
shipped an empty CORRECTNESS artifact and no test caught it.

Covers: enumeration integrity, every oracle SQL binding/planning in
DuckDB against the real views, one cheap query end-to-end vs its oracle,
and the image-corpus queries being sf-independent (query and oracle pinned
to the SAME corpus, so a gate run at any sf can't see a corpus-size
mismatch)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"), reason="testdata absent"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _entry():
    import __ray_entry__ as E

    return E


class TestRegistry:
    def test_enumeration(self):
        E = _entry()
        qs = E.queries()
        oracles = E.oracle_sql()
        assert len(qs) >= 88
        assert all(callable(f) for f in qs.values())
        missing = set(oracles) - set(qs)
        assert not missing, f"oracles without queries: {missing}"
        # rows-only entries are the deliberate exceptions; keep the list
        # explicit so an accidentally-dropped oracle is caught
        rows_only = set(qs) - set(oracles)
        assert rows_only <= {
            "ann_lsh_topk",
            "ann_lsh_topk_ds",
            "embedding_cosine_dedup_lsh",
            "embedding_pca2",
        }, f"unexpected rows-only queries: {rows_only}"

    def test_coverage_first_prefix(self):
        # the driver's gate walks queries() in insertion order under a time
        # budget (round 4 stopped at 50): the first 50 entries must stay the
        # one-query-per-operator-family slate, every one full-oracle-checked
        E = _entry()
        qs = E.queries()
        first50 = list(qs)[:50]
        assert first50 == E._PRIORITY_QUERIES
        oracles = E.oracle_sql()
        no_oracle = [n for n in first50 if n not in oracles]
        assert not no_oracle, f"priority queries without oracles: {no_oracle}"
        # spot-pin the flagship operators the round-4 driver gate missed
        for must in (
            "minhash_dedup_docs", "simhash_dedup_docs",
            "suffix_array_dedup_docs", "minhash_dedup_images",
            "video_near_dedup_videos", "audio_near_dedup_audio",
            "ann_topk", "clustering_ari",
        ):
            assert must in first50, must

    def test_every_oracle_plans_in_duckdb(self, duck):
        # EXPLAIN binds every table/column/function reference without
        # executing — a renamed column or broken generated SQL fails here
        E = _entry()
        for name, sql in E.oracle_sql().items():
            assert isinstance(sql, str) and sql.strip(), name
            try:
                duck.execute(f"EXPLAIN {sql}")
            except Exception as e:  # noqa: BLE001
                pytest.fail(f"oracle {name} failed to plan: {e}")

    def test_cheap_query_end_to_end(self, duck):
        E = _entry()
        got = E.queries()["lang_counts"](SF).to_pandas()
        exp = duck.execute(E.oracle_sql()["lang_counts"]).fetchdf()
        cols = sorted(got.columns)
        assert sorted(exp.columns) == cols
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = exp[cols].sort_values(cols).reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()

    def test_entry_runs(self):
        E = _entry()
        out = E.entry()
        n = out.count() if hasattr(out, "count") and callable(out.count) else len(out)
        assert n > 0


class TestImageCorpusPinning:
    def test_image_query_sf_independent(self, duck):
        # the corpus queries ignore sf_dir (pinned to the oracle corpus):
        # identical results at sf0.001 and sf0.01, both matching the oracle
        E = _entry()
        q = E.queries()["phash_near_dedup_images"]
        a = q("/root/testdata/sf0.001").to_pandas()
        b = q("/root/testdata/sf0.01").to_pandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()
        exp = duck.execute(E.oracle_sql()["phash_near_dedup_images"]).fetchdf()
        exp = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(exp)
        assert a.values.tolist() == exp.values.tolist()
