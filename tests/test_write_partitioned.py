"""Resumable hive-partitioned parquet sink."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from text_dedup_ray.sources.io import write_partitioned


def _tbl():
    return pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "lang": ["en", "en", "fr", "fr", "de", "de"],
            "n": [10, 20, 30, 40, 50, 60],
        }
    )


def _read_all(path: str) -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("lang="):
            continue
        files = glob.glob(os.path.join(path, d, "*.parquet"))
        rows = []
        for f in files:
            rows.extend(pq.read_table(f)["doc_id"].to_pylist())
        out[d.split("=")[1]] = sorted(rows)
    return out


class TestWritePartitioned:
    def test_layout_markers_and_contents(self, tmp_path):
        ds = ray.data.from_arrow(_tbl()).repartition(3)
        res = write_partitioned(ds, str(tmp_path / "out"), by="lang")
        assert sorted(res["written"]) == ["de", "en", "fr"]
        assert res["skipped"] == []
        got = _read_all(str(tmp_path / "out"))
        assert got == {"de": [5, 6], "en": [1, 2], "fr": [3, 4]}
        for lang in got:
            assert os.path.exists(str(tmp_path / "out" / f"lang={lang}" / "_SUCCESS"))

    def test_skip_existing_resumes_only_missing(self, tmp_path):
        out = str(tmp_path / "out")
        ds = ray.data.from_arrow(_tbl())
        write_partitioned(ds, out, by="lang")
        # simulate a failed 'fr' partition: files written but no marker
        os.remove(os.path.join(out, "lang=fr", "_SUCCESS"))
        for f in glob.glob(os.path.join(out, "lang=fr", "*.parquet")):
            os.remove(f)
        # poison finished partitions to prove they are not rewritten
        sentinel = os.path.join(out, "lang=en", "sentinel.txt")
        open(sentinel, "w").write("x")
        res = write_partitioned(ds, out, by="lang", skip_existing=True)
        assert res["written"] == ["fr"] and sorted(res["skipped"]) == ["de", "en"]
        assert os.path.exists(sentinel)
        assert _read_all(out) == {"de": [5, 6], "en": [1, 2], "fr": [3, 4]}

    def test_overwrite_replaces_stale_parts(self, tmp_path):
        out = str(tmp_path / "out")
        ds = ray.data.from_arrow(_tbl())
        write_partitioned(ds, out, by="lang")
        before = _read_all(out)
        write_partitioned(ds, out, by="lang")  # overwrite, not doubled
        assert _read_all(out) == before

    def test_all_skipped_writes_nothing(self, tmp_path):
        out = str(tmp_path / "out")
        ds = ray.data.from_arrow(_tbl())
        write_partitioned(ds, out, by="lang")
        res = write_partitioned(ds, out, by="lang", skip_existing=True)
        assert res["written"] == [] and sorted(res["skipped"]) == ["de", "en", "fr"]
