"""Round-2 source/verify additions: row-group-granular row-id stamping, the
HF dataset-dir reader, and the verify_clusters giant-cluster cap."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.sources.io import (
    read_hf_dataset_dir,
    read_parquet_with_row_ids,
    read_table,
)


class TestRowGroupStamping:
    def test_multi_row_group_file_is_many_blocks(self, tmp_path):
        n = 1000
        t = pa.table({"v": pa.array(range(n), pa.int64())})
        f = str(tmp_path / "a.parquet")
        pq.write_table(t, f, row_group_size=100)
        assert pq.ParquetFile(f).metadata.num_row_groups == 10

        ds = read_parquet_with_row_ids(f)
        # read parallelism is row-group-granular (>= 10 read tasks), never
        # the round-1 one-block-per-FILE repartition
        assert ds.materialize().num_blocks() >= 10
        df = ds.to_pandas().sort_values("v").reset_index(drop=True)
        assert (df["row_id"].to_numpy() == df["v"].to_numpy()).all()

    def test_offsets_across_files(self, tmp_path):
        fa, fb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
        pq.write_table(pa.table({"v": pa.array(range(300), pa.int64())}), fa, row_group_size=128)
        pq.write_table(
            pa.table({"v": pa.array(range(300, 500), pa.int64())}), fb, row_group_size=128
        )
        ds = read_parquet_with_row_ids([fa, fb])
        df = ds.to_pandas().sort_values("v").reset_index(drop=True)
        # deterministic global ids: file order x row-group order x row order
        assert (df["row_id"].to_numpy() == np.arange(500)).all()

    def test_column_pruning(self, tmp_path):
        f = str(tmp_path / "a.parquet")
        pq.write_table(
            pa.table({"v": pa.array(range(50), pa.int64()), "w": pa.array(range(50), pa.int64())}),
            f,
        )
        ds = read_parquet_with_row_ids(f, columns=["v"])
        assert set(ds.schema().names) == {"v", "row_id"}


class TestHFDatasetDir:
    def _write_hf_dir(self, root, tables):
        os.makedirs(root, exist_ok=True)
        files = []
        for i, t in enumerate(tables):
            name = f"data-{i:05d}-of-{len(tables):05d}.arrow"
            with open(os.path.join(root, name), "wb") as fh:
                with ipc.new_stream(fh, t.schema) as w:
                    for b in t.to_batches(max_chunksize=64):
                        w.write_batch(b)
            files.append(name)
        with open(os.path.join(root, "state.json"), "w") as fh:
            json.dump(
                {"_data_files": [{"filename": n} for n in files], "_format_type": None},
                fh,
            )

    def test_round_trip(self, tmp_path):
        root = str(tmp_path / "hfds")
        t1 = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                       "text": [f"doc {i}" for i in range(100)]})
        t2 = pa.table({"doc_id": pa.array(range(100, 150), pa.int64()),
                       "text": [f"doc {i}" for i in range(100, 150)]})
        self._write_hf_dir(root, [t1, t2])

        ds = read_hf_dataset_dir(root)
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(df) == 150
        assert df["text"].tolist()[149] == "doc 149"

    def test_via_read_table_and_pruning(self, tmp_path):
        root = str(tmp_path / "hfds")
        t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                      "text": ["x"] * 20, "extra": ["y"] * 20})
        self._write_hf_dir(root, [t])
        ds = read_table(root, fmt="hf_disk", columns=["doc_id", "text"])
        assert set(ds.schema().names) == {"doc_id", "text"}
        assert ds.count() == 20

    def test_missing_state_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_hf_dataset_dir(str(tmp_path / "nope"))


class TestVerifyGiantClusterCap:
    def _assigned(self, texts, clusters):
        n = len(texts)
        return ray.data.from_arrow(
            pa.table(
                {
                    "row_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "__CLUSTER__": pa.array(clusters, pa.int64()),
                    "__duplicate__": pa.array([True] * n),
                }
            )
        )

    def test_cap_limits_quadratic_and_keeps_min_ids(self):
        from text_dedup_ray.pipelines.verify import verify_clusters

        texts = ["the same exact caption text here ok fine"] * 40
        assigned = self._assigned(texts, [0] * 40)
        parents = verify_clusters(
            assigned, "text", 2, 0, 0.5, mode="minhash", max_cluster=10
        )
        # only the 10 min-id members were verified; all map to min id 0
        assert set(parents.keys()) == set(range(10))
        assert set(parents.values()) == {0}

    def test_uncapped_matches_reference_semantics(self):
        from text_dedup_ray.pipelines.verify import verify_clusters

        texts = [
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon zeta",   # true dup of 0
            "totally different words entirely here now",  # false positive
        ]
        assigned = self._assigned(texts, [0, 0, 0])
        parents = verify_clusters(
            assigned, "text", 2, 0, 0.5, mode="minhash", max_cluster=1000
        )
        assert parents == {0: 0, 1: 0}  # FP member 2 dropped from the cluster
