"""Ingestion utilities: mixed-shard schema harmonizer + small-file
parquet compaction."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from text_dedup_ray.sources.io import compact_parquet_dir, harmonize_schema


class TestHarmonizeSchema:
    def test_reorder_cast_fill_drop(self):
        t1 = pa.table(
            {"a": pa.array([1, 2], pa.int32()), "b": ["x", "y"], "junk": [9, 9]}
        )
        t2 = pa.table({"b": ["z"], "c": [1.5]})
        target = pa.schema(
            [("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())]
        )
        out = harmonize_schema(
            ray.data.from_arrow(t1).union(ray.data.from_arrow(t2)), target
        ).to_pandas()
        assert list(out.columns) == ["a", "b", "c"]
        assert sorted(out.b) == ["x", "y", "z"]
        assert out.a.isna().sum() == 1 and out.c.isna().sum() == 2

    def test_blocks_concat_after_harmonize(self):
        t1 = pa.table({"a": pa.array([1], pa.int16())})
        t2 = pa.table({"a": pa.array([2], pa.int64()), "b": ["x"]})
        target = pa.schema([("a", pa.int64()), ("b", pa.string())])
        ds = harmonize_schema(
            ray.data.from_arrow(t1).union(ray.data.from_arrow(t2)), target
        )
        got = ds.to_pandas()  # concat across blocks must not raise
        assert len(got) == 2


class TestCompactParquetDir:
    def test_row_preserving_compaction(self, tmp_path):
        d = str(tmp_path)
        for i in range(15):
            pq.write_table(
                pa.table({"x": list(range(i * 10, i * 10 + 10))}),
                f"{d}/part-{i}.parquet",
            )
        stats = compact_parquet_dir(d, target_rows_per_file=60, delete_inputs=True)
        assert stats["files_in"] == 15 and stats["rows"] == 150
        assert stats["files_out"] < 15
        n, nd = duckdb.sql(
            f"SELECT count(*), count(DISTINCT x) FROM read_parquet('{d}/*.parquet')"
        ).fetchone()
        assert (n, nd) == (150, 150)
        assert not [f for f in os.listdir(d) if f.startswith("part-")]

    def test_empty_dir(self, tmp_path):
        stats = compact_parquet_dir(str(tmp_path))
        assert stats == {"files_in": 0, "files_out": 0, "rows": 0}

    def test_idempotent_on_compacted(self, tmp_path):
        d = str(tmp_path)
        pq.write_table(pa.table({"x": [1, 2, 3]}), f"{d}/part-0.parquet")
        compact_parquet_dir(d, target_rows_per_file=10, delete_inputs=True)
        # second run sees only compact-* files -> no-op
        stats = compact_parquet_dir(d, target_rows_per_file=10)
        assert stats["files_in"] == 0

    def test_rerun_after_crash_window_never_doubles(self, tmp_path):
        """Crash between write and delete leaves originals + compacts;
        the re-run must reconcile, not double rows."""
        d = str(tmp_path)
        for i in range(4):
            pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}), f"{d}/part-{i}.parquet")
        # simulate the crashed first run: compacted output exists, originals too
        compact_parquet_dir(d, target_rows_per_file=40, delete_inputs=False)
        assert [f for f in os.listdir(d) if f.startswith("compact-")]
        stats = compact_parquet_dir(d, target_rows_per_file=40, delete_inputs=True)
        assert stats["rows"] == 40
        n, nd = duckdb.sql(
            f"SELECT count(*), count(DISTINCT x) FROM read_parquet('{d}/*.parquet')"
        ).fetchone()
        assert (n, nd) == (40, 40)
