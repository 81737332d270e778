"""Cluster inspection report (report/gradio_app.py parity surface)."""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from text_dedup_ray.report import cluster_samples, cluster_summary, render_html, write_report


def _fixture():
    # 10 docs: cluster 0 has 4 members, cluster 4 has 2, rest unique
    cluster = pa.table(
        {
            "row_id": pa.array(range(10), pa.int64()),
            "cluster_id": pa.array([0, 0, 0, 0, 4, 4, 6, 7, 8, 9], pa.int64()),
        }
    )
    docs = pa.table(
        {
            "row_id": pa.array(range(10), pa.int64()),
            "text": pa.array([f"document number {i} body" for i in range(10)]),
        }
    )
    return ray.data.from_arrow(cluster).repartition(3), ray.data.from_arrow(docs).repartition(2)


def test_summary_stats_match_reference_definitions():
    cl, _ = _fixture()
    s = cluster_summary(cl, num_top=3)
    assert s["total_records"] == 10
    assert s["total_clusters"] == 6
    assert s["unique_records"] == 4          # clusters of size 1
    assert s["duplicate_clusters"] == 2
    assert s["records_in_duplicate_clusters"] == 6
    assert abs(s["dedup_rate"] - (1 - 6 / 10)) < 1e-12
    assert s["max_cluster_size"] == 4
    assert s["size_histogram"] == {1: 4, 2: 1, 4: 1}
    assert s["top_clusters"][0] == {"cluster_id": 0, "size": 4}


def test_samples_fetch_only_top_clusters():
    cl, docs = _fixture()
    s = cluster_summary(cl, num_top=2)
    samples = cluster_samples(cl, docs, s["top_clusters"], text_column="text")
    assert [c["cluster_id"] for c in samples] == [0, 4]
    assert [m["row_id"] for m in samples[0]["members"]] == [0, 1, 2, 3]
    assert samples[0]["members"][0]["text"] == "document number 0 body"


def test_write_report_files(tmp_path):
    cl, docs = _fixture()
    prefix = str(tmp_path / "rep")
    summary = write_report(cl, docs, prefix, text_column="text")
    with open(prefix + ".json") as fh:
        data = json.load(fh)
    assert data["summary"]["total_records"] == 10
    html_text = open(prefix + ".html").read()
    assert "Cluster size distribution" in html_text
    assert "document number 0 body" in html_text
    assert summary["dedup_rate"] > 0


def test_render_html_escapes():
    out = render_html(
        {
            "total_records": 1, "total_clusters": 1, "unique_records": 1,
            "duplicate_clusters": 0, "records_in_duplicate_clusters": 0,
            "dedup_rate": 0.0, "avg_cluster_size": 1.0, "max_cluster_size": 1,
            "min_cluster_size": 1, "size_histogram": {1: 1}, "top_clusters": [],
        },
        [{"cluster_id": 1, "size": 1, "members": [{"row_id": 1, "text": "<script>x"}]}],
    )
    assert "<script>x" not in out and "&lt;script&gt;x" in out
