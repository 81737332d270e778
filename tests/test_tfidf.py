"""Distributed TF-IDF top-k terms per document."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.tfidf import tfidf_top_terms


def _oracle(k: int) -> str:
    return (
        "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9_]+')) AS token FROM t), "
        "tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok "
        "GROUP BY doc_id, token), "
        "df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token), "
        "n AS (SELECT count(*)::DOUBLE AS nn FROM t), "
        "scored AS (SELECT tf.doc_id, tf.token, tf.tf, df.df, "
        "round(tf.tf * ln(nn / df.df), 6) AS score "
        "FROM tf JOIN df USING (token) CROSS JOIN n), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, token ASC) AS rk FROM scored) "
        f"SELECT doc_id, token, tf, df, score, rk::BIGINT AS rk "
        f"FROM ranked WHERE rk <= {k}"
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


class TestTfIdf:
    def test_matches_duckdb(self):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(40)] + ["rare_gem", "ultra_rare"]
        texts = [
            " ".join(vocab[j] for j in rng.integers(0, len(vocab), 30))
            for _ in range(60)
        ]
        texts[7] += " rare_gem rare_gem"
        tbl = pa.table({"doc_id": list(range(60)), "text": texts})
        got = tfidf_top_terms(
            ray.data.from_arrow(tbl).repartition(4), k=4, num_partitions=5
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(_oracle(4)).fetchdf()
        pd.testing.assert_frame_equal(
            _canon(got), _canon(exp), check_dtype=False
        )

    def test_rare_term_outranks_common(self):
        tbl = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "common common unique_marker",
                    "common stuff",
                    "common stuff",
                    "common stuff",
                ],
            }
        )
        got = tfidf_top_terms(ray.data.from_arrow(tbl), k=1).to_pandas()
        row = got[got.doc_id == 1].iloc[0]
        assert row.token == "unique_marker" and row.df == 1 and row.rk == 1
        # 'common' appears in every doc -> idf 0 -> score 0 wherever kept
        common = got[got.token == "common"]
        assert common.empty or (common.score == 0.0).all()

    def test_partition_invariance(self):
        tbl = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["a b c a", "b c d", "d e f"],
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        a = tfidf_top_terms(ds, k=2, num_partitions=1).to_pandas()
        b = tfidf_top_terms(ds, k=2, num_partitions=7).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))

    def test_empty(self):
        tbl = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        assert tfidf_top_terms(ray.data.from_arrow(tbl), k=3).count() == 0


SURPRISAL_SQL = (
    "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
    "'[a-z0-9_]+')) AS token FROM t), "
    "ct AS (SELECT token, count(*)::DOUBLE AS c FROM tok GROUP BY token), "
    "tot AS (SELECT count(*)::DOUBLE AS tt FROM tok), "
    "tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok "
    "GROUP BY doc_id, token) "
    "SELECT doc_id, sum(tf)::BIGINT AS n_tokens, "
    "round(-sum(tf * ln(ct.c / tot.tt)) / sum(tf), 6) AS surprisal "
    "FROM tf JOIN ct USING (token) CROSS JOIN tot GROUP BY doc_id"
)


class TestSurprisal:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.tfidf import with_unigram_surprisal

        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(30)]
        texts = [
            " ".join(vocab[min(int(abs(x) * 6), 29)] for x in rng.standard_normal(20))
            for _ in range(70)
        ]
        tbl = pa.table({"doc_id": list(range(70)), "text": texts})
        got = with_unigram_surprisal(
            ray.data.from_arrow(tbl).repartition(4), num_partitions=5
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(SURPRISAL_SQL).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_rare_tokens_score_higher(self):
        from text_dedup_ray.pipelines.tfidf import with_unigram_surprisal

        tbl = pa.table(
            {
                "doc_id": [1, 2],
                "text": ["common common common common", "rarest common gem common"],
            }
        )
        got = (
            with_unigram_surprisal(ray.data.from_arrow(tbl))
            .to_pandas()
            .set_index("doc_id")
        )
        assert got.loc[2, "surprisal"] > got.loc[1, "surprisal"]
        assert got.n_tokens.tolist() == [4, 4]

    def test_empty(self):
        from text_dedup_ray.pipelines.tfidf import with_unigram_surprisal

        tbl = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        assert with_unigram_surprisal(ray.data.from_arrow(tbl)).count() == 0
