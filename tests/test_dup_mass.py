"""Duplicate-mass report: per-group exact-duplicate counts vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.corpus import dup_mass_by_group

ORACLE = """
SELECT source,
       count(*) AS n_docs,
       coalesce(sum(CASE WHEN doc_id <> m THEN 1 ELSE 0 END), 0) AS n_dups
FROM (
  SELECT doc_id, source, min(doc_id) OVER (PARTITION BY text) AS m FROM t
)
GROUP BY source
ORDER BY source
"""


def _corpus(n: int = 400) -> pa.Table:
    rng = np.random.default_rng(11)
    ids = np.arange(1, n + 1, dtype=np.int64)
    # ~35% of docs reuse one of 80 template texts -> cross-source dup clusters
    tpl = rng.integers(0, 80, size=n)
    uniq = rng.integers(0, 2, size=n)
    texts = [
        f"template text {t}" if u == 0 else f"unique text {i} {t}"
        for i, (t, u) in enumerate(zip(tpl, uniq))
    ]
    src = rng.choice(["wiki", "crawl", "books"], size=n)
    return pa.table(
        {
            "doc_id": ids,
            "text": pa.array(texts, pa.string()),
            "source": pa.array(src.tolist(), pa.string()),
        }
    )


def test_matches_duckdb(ray_session):
    tbl = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = (
        dup_mass_by_group(ds, text_column="text", group_column="source",
                          id_column="doc_id", num_partitions=4)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(ORACLE).fetch_df()
    con.close()
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].astype(int).tolist()
    assert got["n_dups"].tolist() == want["n_dups"].astype(int).tolist()


def test_no_duplicates_all_zero(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a", "b", "c"], pa.string()),
            "source": pa.array(["x", "x", "y"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = dup_mass_by_group(
        ds, text_column="text", group_column="source", id_column="doc_id"
    ).to_pandas().sort_values("source")
    assert got["n_dups"].tolist() == [0, 0]
    assert got["n_docs"].tolist() == [2, 1]


def test_cross_group_cluster_counts_losers_in_their_group(ray_session):
    """One text shared by three groups: the min-id doc's group gets no dup,
    the other two groups each count one loser."""
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": pa.array(["same", "same", "same"], pa.string()),
            "source": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = (
        dup_mass_by_group(ds, text_column="text", group_column="source",
                          id_column="doc_id")
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    assert got["n_dups"].tolist() == [0, 1, 1]
