"""mixture_select: proportional quota split + per-group greedy selection,
DuckDB parity (floor'd quotas in SQL), absent-group exclusion, and the
degenerate weight validations."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.select import mixture_select


def _docs(seed=5, n=200):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": [f"l{int(i)}" for i in rng.integers(0, 4, n)],
            "n_tokens": pa.array(rng.integers(1, 50, n).astype(np.int64)),
        }
    )


def test_mixture_select_matches_duckdb():
    t = _docs()
    weights = {"l0": 0.5, "l1": 0.25, "l2": 0.25}  # l3 absent -> excluded
    total = 600
    got = (
        mixture_select(
            ray.data.from_arrow(t), weights, total, "lang", "doc_id",
            "n_tokens", num_partitions=4,
        )
        .to_pandas()
        .sort_values(["lang", "sel_offset"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        WITH ranked AS (SELECT lang, doc_id, n_tokens,
          sum(n_tokens) OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id
              ROWS UNBOUNDED PRECEDING) AS run FROM t),
        q AS (SELECT *, CASE lang
          WHEN 'l0' THEN floor(600 * 0.5 / 1.0)
          WHEN 'l1' THEN floor(600 * 0.25 / 1.0)
          WHEN 'l2' THEN floor(600 * 0.25 / 1.0)
          ELSE 0 END AS quota FROM ranked)
        SELECT lang, doc_id, n_tokens, (run - n_tokens)::BIGINT AS sel_offset
        FROM q WHERE run <= quota
        ORDER BY lang, sel_offset
        """
    ).fetchdf()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["sel_offset"].tolist() == exp["sel_offset"].tolist()
    assert "l3" not in set(got["lang"])
    # each group's selected total respects its quota
    sums = got.groupby("lang")["n_tokens"].sum()
    assert sums.get("l0", 0) <= 300 and sums.get("l1", 0) <= 150


def test_mixture_select_validations():
    t = _docs()
    with pytest.raises(ValueError, match="non-empty"):
        mixture_select(ray.data.from_arrow(t), {}, 100, "lang", "doc_id", "n_tokens")
    with pytest.raises(ValueError, match="sum to > 0"):
        mixture_select(
            ray.data.from_arrow(t), {"l0": 0.0}, 100, "lang", "doc_id", "n_tokens"
        )
