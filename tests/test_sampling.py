"""Weighted corpus mixing (per-source deterministic sampling)."""

import pyarrow as pa
import ray


class TestWeightedMix:
    def test_matches_duckdb_and_rates(self):
        import duckdb

        docs = pa.table(
            {
                "doc_id": list(range(4000)),
                "src": (["wiki", "crawl", "logs", "crawl"] * 1000),
            }
        )
        from text_dedup_ray.pipelines.sample import weighted_sample_by_group

        w = {"wiki": 1.0, "crawl": 0.3, "logs": 0.0}
        got = (
            weighted_sample_by_group(
                ray.data.from_arrow(docs).repartition(5), "src", "doc_id", w
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", docs)
        exp = con.execute(
            "SELECT doc_id, src FROM t WHERE "
            "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT < "
            "CASE src WHEN 'wiki' THEN 1.0 WHEN 'crawl' THEN 0.3 "
            "WHEN 'logs' THEN 0.0 ELSE 0.0 END * 4294967296.0 "
            "ORDER BY doc_id"
        ).fetchdf()
        assert got.doc_id.tolist() == exp.doc_id.tolist()
        by = got.groupby("src").size()
        assert by.get("wiki", 0) == 1000 and by.get("logs", 0) == 0
        assert 450 < by.get("crawl", 0) < 750  # ~0.3 of 2000

    def test_unknown_group_default_and_determinism(self):
        from text_dedup_ray.pipelines.sample import weighted_sample_by_group

        docs = pa.table({"doc_id": list(range(100)), "src": ["x"] * 100})
        ds = ray.data.from_arrow(docs)
        assert weighted_sample_by_group(ds, "src", "doc_id", {"y": 1.0}).count() == 0
        a = weighted_sample_by_group(ds, "src", "doc_id", {"x": 0.5}).to_pandas()
        b = weighted_sample_by_group(
            ds.repartition(7), "src", "doc_id", {"x": 0.5}
        ).to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id)
