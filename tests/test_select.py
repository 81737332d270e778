"""pipelines/select: quality-aware survivor policy + token-budget
selection, DuckDB-parity + edge cases."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.select import keep_best_in_cluster, select_token_budget


def _ds(tbl: pa.Table) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl)


class TestKeepBest:
    def test_argmax_with_ties(self):
        t = pa.table(
            {
                "id": [1, 2, 3, 4, 5, 6],
                "cluster": [10, 10, 10, 20, 20, 30],
                "score": [5, 9, 9, 1, 1, 7],
            }
        )
        out = (
            keep_best_in_cluster(_ds(t), "cluster", "score", "id", num_partitions=3)
            .to_pandas()
            .sort_values("cluster")
        )
        # cluster 10: score tie 9 at ids 2,3 -> min id 2; cluster 20: tie -> id 4
        assert out["id"].tolist() == [2, 4, 6]
        assert list(out.columns.sort_values()) == ["cluster", "id", "score"]

    def test_float_scores_and_partition_invariance(self):
        rng = np.random.default_rng(7)
        n = 2000
        t = pa.table(
            {
                "id": np.arange(n),
                "cluster": rng.integers(0, 150, n),
                "score": rng.random(n),
            }
        )
        exp = duckdb.sql(
            "SELECT id FROM t QUALIFY row_number() OVER "
            "(PARTITION BY cluster ORDER BY score DESC, id) = 1 ORDER BY id"
        ).fetchall()
        for parts in (1, 4, 16):
            got = sorted(
                keep_best_in_cluster(
                    _ds(t).repartition(5), "cluster", "score", "id", num_partitions=parts
                )
                .to_pandas()["id"]
                .tolist()
            )
            assert got == [r[0] for r in exp]

    def test_empty(self):
        t = pa.table(
            {
                "id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        out = keep_best_in_cluster(_ds(t), "cluster", "score", "id")
        assert out.count() == 0


class TestTokenBudget:
    def _table(self, n=1000, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "id": np.arange(n),
                "tok": rng.integers(1, 200, n),
                "score": rng.integers(0, 50, n),
            }
        )

    def test_matches_sql_window(self):
        t = self._table()
        budget = int(0.3 * float(np.sum(t["tok"].to_numpy())))
        exp = duckdb.sql(
            f"""
            WITH s AS (
              SELECT id, tok, score,
                     coalesce(sum(tok) OVER (ORDER BY score DESC, id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS sel_offset
              FROM t)
            SELECT id, tok, score, sel_offset FROM s
            WHERE sel_offset + tok <= {budget} ORDER BY id
            """
        ).fetchdf()
        got = (
            select_token_budget(_ds(t).repartition(7), "id", "tok", "score", budget)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert got["id"].tolist() == exp["id"].tolist()
        assert got["sel_offset"].tolist() == exp["sel_offset"].tolist()

    def test_budget_smaller_than_first_doc(self):
        t = pa.table({"id": [0, 1], "tok": [100, 50], "score": [9, 1]})
        out = select_token_budget(_ds(t), "id", "tok", "score", budget=99)
        # selection is prefix-only: the SQL window cut drops doc 0 (100 > 99)
        # AND doc 1 (its offset still counts doc 0: 100 + 50 > 99)
        assert out.count() == 0

    def test_zero_token_docs_at_exact_budget(self):
        t = pa.table({"id": [0, 1, 2], "tok": [10, 0, 5], "score": [5, 4, 3]})
        got = (
            select_token_budget(_ds(t), "id", "tok", "score", budget=10)
            .to_pandas()["id"]
            .sort_values()
            .tolist()
        )
        # doc0 hits the budget exactly; zero-token doc1 still fits (SQL: 10+0<=10)
        assert got == [0, 1]

    def test_magnitude_guard(self):
        t = pa.table({"id": [0], "tok": [1], "score": [1 << 40]})
        with pytest.raises(Exception, match="2\\^31|composite"):
            select_token_budget(_ds(t), "id", "tok", "score", budget=10).materialize()

    def test_empty(self):
        t = pa.table(
            {
                "id": pa.array([], pa.int64()),
                "tok": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            }
        )
        assert select_token_budget(_ds(t), "id", "tok", "score", 10).count() == 0
