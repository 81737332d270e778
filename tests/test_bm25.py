"""BM25 retrieval: DuckDB parity, brute-force parity, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.tfidf import TOKEN_RE, bm25_topk


def bm25_oracle_sql(
    queries: dict[str, str], k: int, k1: float = 1.2, b: float = 0.75,
    table: str = "t", id_col: str = "doc_id",
) -> str:
    pairs = []
    for name, q in queries.items():
        for t in dict.fromkeys(TOKEN_RE.findall(q.lower())):
            pairs.append(f"('{name}', '{t}')")
    vocab = sorted({t for _, q in queries.items() for t in TOKEN_RE.findall(q.lower())})
    in_list = ", ".join(f"'{t}'" for t in vocab)
    return (
        f"WITH tok AS (SELECT {id_col}, unnest(regexp_extract_all(lower(text), "
        f"'[a-z0-9_]+')) AS token FROM {table}), "
        f"n AS (SELECT count(*)::DOUBLE AS n FROM {table}), "
        "tot AS (SELECT count(*)::DOUBLE AS tl FROM tok), "
        f"dl AS (SELECT {id_col}, count(*)::DOUBLE AS dl FROM tok GROUP BY {id_col}), "
        f"df AS (SELECT token, count(DISTINCT {id_col})::DOUBLE AS df FROM tok "
        f"WHERE token IN ({in_list}) GROUP BY token), "
        f"q(query, token) AS (VALUES {', '.join(pairs)}), "
        f"tf AS (SELECT {id_col}, token, count(*)::DOUBLE AS tf FROM tok "
        f"WHERE token IN ({in_list}) GROUP BY {id_col}, token), "
        "contrib AS (SELECT q.query, tf.doc_id, "
        "ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5)) * "
        f"(tf.tf * ({k1} + 1)) / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / (tot.tl / n.n))) AS c "
        "FROM q JOIN tf USING (token) JOIN df USING (token) "
        f"JOIN dl ON dl.{id_col} = tf.{id_col} CROSS JOIN n CROSS JOIN tot), "
        f"scored AS (SELECT query, {id_col}, round(sum(c), 4) AS score "
        f"FROM contrib GROUP BY query, {id_col}), "
        f"alldocs AS (SELECT qq.query, d.{id_col}, coalesce(s.score, 0.0) AS score "
        "FROM (SELECT DISTINCT query FROM q) qq CROSS JOIN "
        f"{table} d LEFT JOIN scored s ON s.query = qq.query AND s.{id_col} = d.{id_col}), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY query "
        f"ORDER BY score DESC, {id_col} ASC) AS rk FROM alldocs) "
        f"SELECT query, {id_col}, score, rk::BIGINT AS rk FROM ranked WHERE rk <= {k}"
    )


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


QUERIES = {"storage": "table scan filter", "stream": "stream window batch"}


class TestBM25:
    def _corpus(self, n=80, seed=19):
        rng = np.random.default_rng(seed)
        words = ["table", "scan", "filter", "stream", "window", "batch",
                 "row", "key", "agg", "sort", "join", "merge"]
        texts = [
            " ".join(words[j] for j in rng.integers(0, len(words), rng.integers(3, 25)))
            for _ in range(n)
        ]
        return pa.table({"doc_id": list(range(n)), "text": texts})

    def test_matches_duckdb(self):
        tbl = self._corpus()
        got = bm25_topk(
            ray.data.from_arrow(tbl).repartition(4), QUERIES, k=7
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(bm25_oracle_sql(QUERIES, k=7)).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_matched_doc_outranks_unmatched(self):
        tbl = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["alpha beta gamma", "delta epsilon", "alpha alpha zz"],
            }
        )
        got = bm25_topk(
            ray.data.from_arrow(tbl), {"q": "alpha"}, k=3
        ).to_pandas().sort_values("rk")
        assert got.doc_id.tolist()[:2] == [3, 1] or got.doc_id.tolist()[:2] == [1, 3]
        assert got.doc_id.iloc[2] == 2 and got.score.iloc[2] == 0.0
        assert (got[got.doc_id == 2].score == 0).all()

    def test_partition_invariance(self):
        tbl = self._corpus(n=40, seed=5)
        ds = ray.data.from_arrow(tbl)
        a = bm25_topk(ds.repartition(1), QUERIES, k=5).to_pandas()
        b = bm25_topk(ds.repartition(7), QUERIES, k=5).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))

    def test_empty_corpus(self):
        tbl = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        assert bm25_topk(ray.data.from_arrow(tbl), QUERIES, k=3).count() == 0

    def test_all_stopword_query_returns_zero_scored_topk(self):
        # regression: an empty query vocabulary must NOT collapse to an
        # empty result — SQL LEFT JOIN/coalesce semantics give k
        # zero-scored docs per query (ties -> smallest doc_id)
        tbl = self._corpus(n=20, seed=9)
        got = (
            bm25_topk(
                ray.data.from_arrow(tbl).repartition(3),
                {"nohit": "!!! ???", "alsonothing": "..."},
                k=4,
            )
            .to_pandas()
            .sort_values(["query", "rk"])
        )
        assert len(got) == 8
        assert (got.score == 0.0).all()
        ids = sorted(tbl["doc_id"].to_pylist())[:4]
        for q in ("nohit", "alsonothing"):
            assert got[got["query"] == q].doc_id.tolist() == ids
