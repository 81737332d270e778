"""textops.with_gopher_rules / with_scrubbed: DuckDB parity incl. the
zero-word and empty-string edges."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.textops import with_gopher_rules, with_scrubbed

DOCS = [
    "",  # empty
    "### ... …",  # symbols only, zero words
    "the quick brown fox jumps over the lazy dog and that is all of it "
    "with more words to cross the fifty word minimum " * 3,  # long, passes
    "short doc without enough words",  # fails word count
    "a a a a a " * 20,  # 100 one-char words -> mean_word_len 1 fails
    "the # of ... things … and # more " * 10,  # symbol-heavy
]


def test_gopher_rules_match_duckdb():
    t = pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    got = (
        with_gopher_rules(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        r"""
        WITH g AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_words,
                 len(regexp_extract_all(text, '[A-Za-z0-9_]'))::BIGINT AS n_word_chars,
                 len(regexp_extract_all(text, '(#|\.\.\.|…)'))::BIGINT AS n_symbols,
                 len(regexp_extract_all(text,
                     '\b(the|be|to|of|and|that|have|with|a|in)\b'))::BIGINT AS n_stop
          FROM t)
        SELECT doc_id, n_words, n_word_chars, n_symbols, n_stop,
               CASE WHEN n_words=0 THEN 0.0 ELSE n_word_chars::DOUBLE/n_words END AS mwl,
               CASE WHEN n_words=0 THEN 0.0 ELSE n_symbols::DOUBLE/n_words END AS swr
        FROM g ORDER BY doc_id
        """
    ).fetchdf()
    assert got["n_words"].tolist() == exp["n_words"].tolist()
    assert got["n_word_chars"].tolist() == exp["n_word_chars"].tolist()
    assert got["n_symbols"].tolist() == exp["n_symbols"].tolist()
    assert got["n_stopword_hits"].tolist() == exp["n_stop"].tolist()
    assert got["mean_word_len"].tolist() == exp["mwl"].tolist()
    assert got["symbol_word_ratio"].tolist() == exp["swr"].tolist()
    # rule outcomes on the planted docs
    assert got["gopher_pass"].tolist()[0:2] == [False, False]
    assert bool(got["gopher_pass"][2]) is True
    assert bool(got["ok_word_count"][3]) is False
    assert bool(got["ok_mean_word_len"][4]) is False
    assert bool(got["ok_symbol_ratio"][5]) is False


def test_scrubbed_matches_duckdb():
    rows = [
        '{"k": 87}',
        "no digits here",
        "",
        "a1b22c333 4444",
        "9" * 50,
    ]
    t = pa.table({"event_id": list(range(len(rows))), "props": rows})
    got = (
        with_scrubbed(ray.data.from_arrow(t), "props", r"\d+", "<NUM>")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        r"""SELECT event_id, regexp_replace(props, '\d+', '<NUM>', 'g') AS s,
               len(regexp_extract_all(props, '\d+'))::BIGINT AS n
            FROM t ORDER BY event_id"""
    ).fetchdf()
    assert got["scrubbed"].tolist() == exp["s"].tolist()
    assert got["n_scrubbed"].tolist() == exp["n"].tolist()
    assert got["scrubbed"][3] == "a<NUM>b<NUM>c<NUM> <NUM>"


class TestExtractedInt:
    def test_matches_json_extract(self):
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray

        from text_dedup_ray.pipelines.textops import with_extracted_int

        tbl = pa.table(
            {
                "i": [1, 2, 3, 4],
                "props": ['{"k": 87}', '{"k": 0}', "not json", '{"j": 5}'],
            }
        )
        got = with_extracted_int(
            ray.data.from_arrow(tbl), "props", '"k": (?P<v>[0-9]+)', "k",
            keep_columns=("i",),
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        # RE2-equivalent oracle (json_extract_string raises on the
        # deliberately malformed row; the gate corpus is all-valid JSON)
        exp = con.execute(
            "SELECT i, CAST(NULLIF(regexp_extract(props, '\"k\": ([0-9]+)', 1), '') "
            "AS BIGINT) AS k FROM t"
        ).fetchdf()
        got = got.sort_values("i").reset_index(drop=True)
        exp = exp.sort_values("i").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
