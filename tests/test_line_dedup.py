"""Corpus-wide exact line dedup (C4/RefinedWeb-style boilerplate cut)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from text_dedup_ray.pipelines.lines import line_dedup


def _oracle_sql(min_len: int) -> str:
    return (
        "WITH ex AS ("
        " SELECT doc_id, d AS line_no, ls[d + 1] AS line"
        " FROM (SELECT doc_id, string_split(text, chr(10)) AS ls,"
        "       unnest(range(len(string_split(text, chr(10))))) AS d FROM t)"
        "), ranked AS ("
        f" SELECT doc_id, line_no, line, (length(line) >= {min_len}) AS q,"
        "  row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn"
        " FROM ex"
        ") SELECT r.doc_id,"
        " coalesce(string_agg(line, chr(10) ORDER BY line_no)"
        "   FILTER (WHERE NOT q OR rn = 1), '') AS text,"
        " count(*) FILTER (WHERE q AND rn > 1)::BIGINT AS n_dropped"
        " FROM ranked r GROUP BY r.doc_id"
    )


def _run(tbl: pa.Table, min_len: int, parts: int = 4, blocks: int = 3) -> pd.DataFrame:
    out = line_dedup(
        ray.data.from_arrow(tbl).repartition(blocks),
        min_line_length=min_len,
        num_partitions=parts,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _expect(tbl: pa.Table, min_len: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", tbl)
    return (
        con.execute(_oracle_sql(min_len))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestLineDedup:
    def test_matches_duckdb_random_corpus(self):
        rng = np.random.default_rng(7)
        pool = [f"line number {i} content" for i in range(12)] + ["", "ab"]
        texts = [
            "\n".join(pool[j] for j in rng.integers(0, len(pool), rng.integers(1, 9)))
            for _ in range(80)
        ]
        tbl = pa.table({"doc_id": list(range(80)), "text": texts})
        got = _run(tbl, min_len=3)
        exp = _expect(tbl, min_len=3)
        pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)

    def test_first_occurrence_wins_and_short_lines_exempt(self):
        tbl = pa.table(
            {
                "doc_id": [10, 20, 30],
                "text": [
                    "keep this boilerplate\nunique alpha\nok",
                    "unique beta\nkeep this boilerplate\nok",
                    "keep this boilerplate\nok\nunique gamma",
                ],
            }
        )
        got = _run(tbl, min_len=5)
        # 'ok' (<5 chars) survives everywhere; boilerplate only in doc 10
        assert got.text.tolist() == [
            "keep this boilerplate\nunique alpha\nok",
            "unique beta\nok",
            "ok\nunique gamma",
        ]
        assert got.n_dropped.tolist() == [0, 1, 1]
        exp = _expect(tbl, min_len=5)
        pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)

    def test_all_lines_cut_yields_empty_text(self):
        tbl = pa.table(
            {"doc_id": [1, 2], "text": ["same line here", "same line here"]}
        )
        got = _run(tbl, min_len=1)
        assert got.text.tolist() == ["same line here", ""]
        assert got.n_dropped.tolist() == [0, 1]

    def test_passthrough_columns_and_partition_invariance(self):
        tbl = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["x shared x\na", "x shared x\nb", "c", "x shared x"],
                "source": ["s1", "s2", "s3", "s4"],
            }
        )
        a = _run(tbl, min_len=3, parts=1, blocks=1)
        b = _run(tbl, min_len=3, parts=7, blocks=4)
        pd.testing.assert_frame_equal(a, b)
        assert a.source.tolist() == ["s1", "s2", "s3", "s4"]
        assert a.text.tolist() == ["x shared x\na", "b", "c", ""]

    def test_custom_delimiter_word_spans(self):
        tbl = pa.table(
            {
                "doc_id": [1, 2],
                "text": ["alpha beta gamma alpha", "beta delta alpha zz"],
            }
        )
        out = line_dedup(
            ray.data.from_arrow(tbl).repartition(2),
            min_line_length=3,
            num_partitions=3,
            delimiter=" ",
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out.text.tolist() == ["alpha beta gamma", "delta zz"]
        assert out.n_dropped.tolist() == [1, 2]

    def test_empty_dataset(self):
        tbl = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        out = line_dedup(ray.data.from_arrow(tbl), num_partitions=2)
        assert out.count() == 0


class TestDedupLinesWithin:
    def _run(self, texts, **kw):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.lines import dedup_lines_within

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        )
        out = dedup_lines_within(ds, **kw).to_pandas().set_index("doc_id")
        return out.sort_index()

    def test_first_occurrence_kept_short_lines_verbatim(self):
        out = self._run(
            [
                "hello\nworld\nhello\nhi\nhi\nworld",
                "unique\nlines\nonly",
                "",
            ],
            min_line_length=4,
        )
        # 'hello'/'world' dupes cut; 'hi' (<4 chars) kept both times
        assert out.loc[0, "text"] == "hello\nworld\nhi\nhi"
        assert out.loc[0, "n_dropped"] == 2
        assert out.loc[1, "text"] == "unique\nlines\nonly"
        assert out.loc[1, "n_dropped"] == 0
        assert out.loc[2, "text"] == "" and out.loc[2, "n_dropped"] == 0

    def test_cross_doc_lines_untouched(self):
        out = self._run(["same line", "same line"], sep="\n")
        assert list(out["text"]) == ["same line", "same line"]
        assert list(out["n_dropped"]) == [0, 0]

    def test_custom_sep_and_empty_segments(self):
        out = self._run(["aaaa  aaaa bbbb"], sep=" ", min_line_length=4)
        # 'aaaa' repeated (2nd dropped); empty segment (<4) kept
        assert out.loc[0, "text"] == "aaaa  bbbb"
        assert out.loc[0, "n_dropped"] == 1
