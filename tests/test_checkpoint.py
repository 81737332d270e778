"""Checkpoint/resume tests: killed-run resume skips completed stages and the
resumed output is identical."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from text_dedup_ray.data.gen import generate_corpus
from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.minhash import minhash_dedup_checkpointed
from text_dedup_ray.state.checkpoint import CheckpointManager, config_hash


class TestCheckpointManager:
    def test_roundtrip_and_hit(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        t = pa.table({"a": pa.array(range(100), pa.int64())})
        calls = []

        def compute():
            calls.append(1)
            return ray.data.from_arrow(t)

        conf = config_hash({"x": 1})
        ds1, cached1 = mgr.stage("s1", conf, compute)
        ds2, cached2 = mgr.stage("s1", conf, compute)
        assert not cached1 and cached2
        assert len(calls) == 1
        assert sorted(ds2.to_pandas()["a"]) == list(range(100))

    def test_config_change_invalidates(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        t = pa.table({"a": pa.array([1], pa.int64())})
        _, c1 = mgr.stage("s", config_hash({"x": 1}), lambda: ray.data.from_arrow(t))
        _, c2 = mgr.stage("s", config_hash({"x": 2}), lambda: ray.data.from_arrow(t))
        assert not c1 and not c2

    def test_lineage_propagates(self):
        h1 = config_hash({"stage": "b"}, parents=[config_hash({"stage": "a", "v": 1})])
        h2 = config_hash({"stage": "b"}, parents=[config_hash({"stage": "a", "v": 2})])
        assert h1 != h2


class TestResume:
    def test_resume_skips_and_matches(self, tmp_path):
        docs, _ = generate_corpus(400, seed=11)
        table = pa.table({"row_id": pa.array(range(400), pa.int64()), "text": docs["caption"]})
        cfg = MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")
        root = str(tmp_path / "ckpt")

        ds = ray.data.from_arrow(table).repartition(3)
        res1, cached1 = minhash_dedup_checkpointed(
            ds, root, source_fingerprint="corpus-v1", cfg=cfg
        )
        assert cached1 == {"signatures": False, "clusters": False}
        out1 = res1.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)

        # "killed and restarted": fresh dataset object, same checkpoint root
        ds2 = ray.data.from_arrow(table).repartition(3)
        res2, cached2 = minhash_dedup_checkpointed(
            ds2, root, source_fingerprint="corpus-v1", cfg=cfg
        )
        assert cached2 == {"signatures": True, "clusters": True}
        out2 = res2.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        assert out1.equals(out2)
        assert res1.parents == res2.parents

        # a different source invalidates everything
        _, cached3 = minhash_dedup_checkpointed(
            ds2, root, source_fingerprint="corpus-v2", cfg=cfg
        )
        assert cached3 == {"signatures": False, "clusters": False}

    def test_partial_resume_after_kill_between_stages(self, tmp_path):
        """Simulate dying after the signature stage: only signatures cached."""
        docs, _ = generate_corpus(200, seed=13)
        table = pa.table({"row_id": pa.array(range(200), pa.int64()), "text": docs["caption"]})
        cfg = MinHashConfig(num_perm=32, bands=8, rows=4, ngram_size=2, hash_func="sha1")
        root = str(tmp_path / "ckpt")

        from text_dedup_ray.pipelines.minhash import min_length_filter
        from text_dedup_ray.state.checkpoint import checkpointed_minhash_signatures

        ds = ray.data.from_arrow(table)
        mgr = CheckpointManager(root)
        filtered = min_length_filter(ds, "text", cfg.min_length)
        _sig, cached = checkpointed_minhash_signatures(
            filtered, cfg, "text", mgr, "src-x"
        )
        assert not cached  # first run computes, then "job dies" here

        res, cached2 = minhash_dedup_checkpointed(
            ray.data.from_arrow(table), root, source_fingerprint="src-x", cfg=cfg
        )
        assert cached2 == {"signatures": True, "clusters": False}
        assert res.deduped.count() > 0


class TestCheckpointedHotPathParity:
    """The resumable variant runs the SAME streaming pipeline as
    minhash_dedup (VERDICT r2 #4): auto CC with the driver_threshold
    contract, hot-path metrics shape, identical output on both CC paths."""

    def test_metrics_shape_and_forced_distributed(self, tmp_path):
        import ray.data as rd

        from text_dedup_ray.pipelines.minhash import minhash_dedup

        docs, _ = generate_corpus(300, seed=17)
        table = pa.table(
            {"row_id": pa.array(range(300), pa.int64()), "text": docs["caption"]}
        )
        cfg = MinHashConfig(num_perm=32, bands=8, rows=4, ngram_size=2, hash_func="sha1")

        res_hot = minhash_dedup(rd.from_arrow(table), text_column="text", cfg=cfg)
        res_ck, cached = minhash_dedup_checkpointed(
            rd.from_arrow(table), str(tmp_path / "a"), source_fingerprint="s", cfg=cfg
        )
        assert res_ck.metrics["cc_path"] == "driver"
        assert set(res_ck.metrics["stage_seconds"]) >= {
            "fingerprint+local_buckets", "rep_merge", "cc", "assign",
        }
        a = res_hot.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        b = res_ck.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        assert a["row_id"].tolist() == b["row_id"].tolist()

        # forced-distributed checkpointed run: Dataset cluster map persisted,
        # resumed run reloads it as a Dataset and matches
        res_d, cached_d = minhash_dedup_checkpointed(
            rd.from_arrow(table), str(tmp_path / "b"), source_fingerprint="s",
            cfg=cfg, driver_threshold=0,
        )
        assert res_d.metrics["cc_path"] == "distributed"
        assert isinstance(res_d.parents, rd.Dataset)
        c = res_d.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        assert a["row_id"].tolist() == c["row_id"].tolist()
        res_d2, cached2 = minhash_dedup_checkpointed(
            rd.from_arrow(table), str(tmp_path / "b"), source_fingerprint="s",
            cfg=cfg, driver_threshold=0,
        )
        assert cached2 == {"signatures": True, "clusters": True}
        assert isinstance(res_d2.parents, rd.Dataset)
        d = res_d2.deduped.to_pandas().sort_values("row_id").reset_index(drop=True)
        assert a["row_id"].tolist() == d["row_id"].tolist()
