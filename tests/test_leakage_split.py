"""leakage_safe_split: duplicates can never straddle a split boundary.

Content mode = hash_split keyed on the text itself (byte-identical copies
co-split by construction, DuckDB-parity). Cluster mode joins each row's
cluster root through hash_join and splits on the ROOT id, extending the
guarantee to near-dup clusters; rows absent from the map are singletons."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.exact import exact_cluster_table
from text_dedup_ray.pipelines.sample import leakage_safe_split

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs():
    texts = [f"doc number {i} body text" for i in range(40)]
    # plant exact dup groups: {3,17,29} and {5,11}
    texts[17] = texts[3]
    texts[29] = texts[3]
    texts[11] = texts[5]
    return pa.table(
        {"doc_id": pa.array(range(40), pa.int64()), "text": texts}
    )


def test_content_mode_duckdb_parity_and_no_leak():
    t = _docs()
    got = (
        leakage_safe_split(ray.data.from_arrow(t), FR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        SELECT doc_id, CASE
          WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT / 4294967296.0 < 0.8 THEN 'train'
          WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT / 4294967296.0 < 0.9 THEN 'val'
          ELSE 'test' END AS split
        FROM t ORDER BY doc_id
        """
    ).fetchdf()
    assert got["split"].tolist() == exp["split"].tolist()
    by_id = dict(zip(got["doc_id"], got["split"]))
    assert by_id[3] == by_id[17] == by_id[29]
    assert by_id[5] == by_id[11]


def test_cluster_mode_roots_decide_and_duckdb_parity():
    t = _docs()
    ds = ray.data.from_arrow(t)
    cmap = exact_cluster_table(ds, id_column="doc_id", num_partitions=4)
    got = (
        leakage_safe_split(
            ds, FR, cluster_map=cmap, id_column="doc_id", num_partitions=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        WITH c AS (SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY text) AS root FROM t)
        SELECT doc_id, CASE
          WHEN ('0x' || substr(md5(root::VARCHAR), 1, 8))::UBIGINT / 4294967296.0 < 0.8 THEN 'train'
          WHEN ('0x' || substr(md5(root::VARCHAR), 1, 8))::UBIGINT / 4294967296.0 < 0.9 THEN 'val'
          ELSE 'test' END AS split
        FROM c ORDER BY doc_id
        """
    ).fetchdf()
    assert got["split"].tolist() == exp["split"].tolist()
    by_id = dict(zip(got["doc_id"], got["split"]))
    assert by_id[3] == by_id[17] == by_id[29]
    assert by_id[5] == by_id[11]


def test_cluster_mode_missing_rows_are_singletons():
    t = _docs()
    ds = ray.data.from_arrow(t)
    # a NON-TRIVIAL-only map (dup members + their roots, nothing else)
    cmap = ray.data.from_arrow(
        pa.table(
            {
                "row_id": pa.array([3, 17, 29, 5, 11], pa.int64()),
                "cluster_id": pa.array([3, 3, 3, 5, 5], pa.int64()),
            }
        )
    )
    got = (
        leakage_safe_split(
            ds, FR, cluster_map=cmap, id_column="doc_id", num_partitions=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    full = exact_cluster_table(ds, id_column="doc_id", num_partitions=4)
    want = (
        leakage_safe_split(
            ds, FR, cluster_map=full, id_column="doc_id", num_partitions=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # non-dup rows are their own root either way -> identical labels
    assert got["split"].tolist() == want["split"].tolist()
