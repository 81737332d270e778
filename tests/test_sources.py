"""Source/sink tests: csv/json readers, cluster-table round trip, output
pruning (reference S1-S5 parity)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from text_dedup_ray.sources.io import (
    read_cluster_table,
    read_table,
    write_cluster_table,
    write_output,
)


class TestReaders:
    def test_csv(self, tmp_path):
        p = str(tmp_path / "t.csv")
        with open(p, "w") as f:
            f.write("doc_id,text\n1,hello world\n2,another doc\n")
        ds = read_table(p, fmt="csv")
        out = ds.to_pandas().sort_values("doc_id")
        assert out["text"].tolist() == ["hello world", "another doc"]

    def test_json(self, tmp_path):
        p = str(tmp_path / "t.json")
        with open(p, "w") as f:
            f.write('{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n')
        ds = read_table(p, fmt="json")
        assert ds.count() == 2

    def test_parquet_columns_pruned(self, tmp_path):
        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]}), p)
        ds = read_table(p, columns=["a", "b"])
        assert set(ds.schema().names) == {"a", "b"}

    def test_unknown_format(self):
        import pytest

        with pytest.raises(ValueError):
            read_table("x", fmt="nope")


class TestSinks:
    def test_write_output_prunes_internal(self, tmp_path):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "row_id": pa.array([1, 2], pa.int64()),
                "__CLUSTER__": pa.array([1, 1], pa.int64()),
                "__duplicate__": pa.array([False, True]),
                "text": ["a", "b"],
            }
        )
        out_dir = str(tmp_path / "out")
        write_output(ray.data.from_arrow(t), out_dir)
        files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
        assert files
        got = pq.read_table(out_dir)
        assert set(got.column_names) == {"doc_id", "text"}

    def test_write_output_overwrites_stale_parts(self, tmp_path):
        # write_parquet appends part files; write_output must replace them
        # (a re-run into the same dir would otherwise double the output)
        t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
        out_dir = str(tmp_path / "out")
        for _ in range(3):
            write_output(ray.data.from_arrow(t), out_dir)
        assert ray.data.read_parquet(out_dir).count() == 3
        write_output(ray.data.from_arrow(t), out_dir, overwrite=False)
        assert ray.data.read_parquet(out_dir).count() == 6

    def test_cluster_table_roundtrip(self, tmp_path):
        p = str(tmp_path / "clusters.parquet")
        parents = {5: 1, 9: 1, 1: 1}
        write_cluster_table(parents, p)
        assert read_cluster_table(p) == parents


class TestMetrics:
    def test_minhash_metrics(self):
        from text_dedup_ray.functions.minhash import MinHashConfig
        from text_dedup_ray.pipelines.minhash import minhash_dedup

        t = pa.table(
            {
                "row_id": pa.array(range(6), pa.int64()),
                "text": ["same caption here repeated fully"] * 3
                + ["one other doc entirely different text"] * 3,
            }
        )
        res = minhash_dedup(
            ray.data.from_arrow(t),
            cfg=MinHashConfig(num_perm=32, bands=8, rows=4, ngram_size=1, hash_func="sha1"),
        )
        m = res.metrics
        assert m["duplicate_rows"] == 4 and m["clusters"] == 2
        assert m["signature_rows"] > 0
