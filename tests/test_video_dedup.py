"""Video near-duplicate detection: frame-phash-set Jaccard + CC.

The reference has no video path (SURVEY: multimodal extension); semantics
here are the engine's own — a video's signature is its DISTINCT set of
sampled-frame average_phash values, near-dup iff exact set Jaccard >=
threshold. Verified three ways: planted-truth recovery on the synthetic
corpus, a DuckDB oracle over the generator's ground-truth frame_phashes
(the same SQL the driver gate runs), and bit-exactness of the vectorized
phash stack against the scalar image kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.data.gen import generate_videos, videos_parquet
from text_dedup_ray.functions.codecs import average_phash, average_phash_stack
from text_dedup_ray.pipelines.video import (
    VideoPhashPostingsStage,
    video_frame_stats,
    video_near_dedup,
)
from text_dedup_ray.stages.cc import cluster_map_table

VIDEO_COLS = ["video_id", "bytes", "fmt", "n_frames", "w", "h"]


def _corpus(n: int = 200, seed: int = 7):
    vp, tp = videos_parquet(n, seed=seed, cache_dir="/tmp/tdr_vtest")
    return vp, tp


def _roots(parents) -> dict[int, int]:
    t = cluster_map_table(parents)
    if isinstance(t, ray.data.Dataset):
        t = pa.concat_tables(ray.get(t.to_arrow_refs()))
    return dict(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))


class TestPhashStack:
    def test_bit_identical_to_scalar_kernel(self):
        rng = np.random.RandomState(3)
        frames = rng.randint(0, 256, size=(64, 16, 16), dtype=np.uint8)
        vec = average_phash_stack(frames)
        scal = np.array([average_phash(f[:, :, None]) for f in frames])
        assert (vec == scal).all()

    def test_non_tiling_shape_falls_back(self):
        rng = np.random.RandomState(4)
        frames = rng.randint(0, 256, size=(5, 17, 16), dtype=np.uint8)
        vec = average_phash_stack(frames)
        scal = np.array([average_phash(f[:, :, None]) for f in frames])
        assert (vec == scal).all()

    def test_empty_stack(self):
        assert len(average_phash_stack(np.empty((0, 16, 16), np.uint8))) == 0


class TestVideoCorpus:
    def test_deterministic(self):
        a, ta = generate_videos(80, seed=7)
        b, tb = generate_videos(80, seed=7)
        assert a.equals(b) and ta.equals(tb)

    def test_ground_truth_phashes_match_bytes(self):
        videos, _ = generate_videos(40, seed=7)
        for row in videos.to_pylist():
            pix = np.frombuffer(row["bytes"], np.uint8).reshape(
                row["n_frames"], row["h"], row["w"]
            )
            assert list(average_phash_stack(pix)) == row["frame_phashes"]


class TestVideoNearDedup:
    @pytest.mark.parametrize("every_n", [1, 2])
    def test_planted_truth_recovered(self, every_n):
        vp, tp = _corpus(200)
        ds = ray.data.read_parquet(vp, columns=VIDEO_COLS)
        roots = _roots(video_near_dedup(ds, every_n=every_n, threshold=0.5))
        truth = pq.read_table(tp)
        rids = [int(v[4:]) for v in truth["video_id"].to_pylist()]
        by_cluster: dict[int, list[tuple[int, str]]] = {}
        for rid, cid, kind in zip(
            rids, truth["cluster_id"].to_pylist(), truth["kind"].to_pylist()
        ):
            by_cluster.setdefault(cid, []).append((rid, kind))
        # planted Jaccard targets are stated over the FULL frame set; suffix
        # trims survive any every_n (sampled subset stays a subset), but a
        # perturbed/near-miss copy's SAMPLED Jaccard legitimately moves when
        # replaced positions concentrate on sampled indices — those kinds
        # are guaranteed only at every_n=1 (every_n=2 is covered exactly by
        # the DuckDB-oracle parity test instead)
        full = every_n == 1
        for members in by_cluster.values():
            kind = members[0][1]
            got = {roots.get(r, r) for r, _ in members}
            if len(members) > 1 and (
                kind in ("exact", "trimmed") or (kind == "perturbed" and full)
            ):
                assert len(got) == 1, (kind, members, got)
            if kind == "near-miss" and len(members) > 1 and full:
                assert len(got) == len(members), (members, got)
        if full:
            # no cross-truth-cluster merges either
            cluster_of = {}
            for cid, members in by_cluster.items():
                for r, _ in members:
                    cluster_of[r] = cid
            seen: dict[int, int] = {}
            for r in rids:
                root = roots.get(r, r)
                if root in seen:
                    assert seen[root] == cluster_of[r], (root, r)
                else:
                    seen[root] = cluster_of[r]

    def test_matches_duckdb_oracle(self):
        import duckdb

        from text_dedup_ray.oracles import video_near_dedup_sql

        vp, _ = _corpus(200)
        ds = ray.data.read_parquet(vp, columns=VIDEO_COLS)
        ours = (
            cluster_map_table(video_near_dedup(ds, every_n=2, threshold=0.5))
            .to_pandas()
            .sort_values(["row_id", "cluster_id"])
            .reset_index(drop=True)
        )
        theirs = (
            duckdb.connect()
            .execute(video_near_dedup_sql(vp, threshold=0.5, every_n=2))
            .fetchdf()
            .sort_values(["row_id", "cluster_id"])
            .reset_index(drop=True)
        )
        assert ours.equals(theirs.astype(ours.dtypes.to_dict()))

    def test_frame_stats_matches_oracle(self):
        import duckdb

        from text_dedup_ray.oracles import video_frame_stats_sql

        vp, _ = _corpus(200)
        ours = (
            video_frame_stats(ray.data.read_parquet(vp), every_n=2)
            .to_pandas()
            .sort_values("video_id")
            .reset_index(drop=True)
        )
        theirs = (
            duckdb.connect()
            .execute(video_frame_stats_sql(vp, every_n=2))
            .fetchdf()
            .sort_values("video_id")
            .reset_index(drop=True)
        )
        assert ours.equals(theirs.astype(ours.dtypes.to_dict()))

    def test_empty_dataset(self):
        empty = ray.data.from_arrow(
            pa.table(
                {
                    "video_id": pa.array([], pa.string()),
                    "bytes": pa.array([], pa.binary()),
                    "fmt": pa.array([], pa.string()),
                    "n_frames": pa.array([], pa.int32()),
                    "w": pa.array([], pa.int32()),
                    "h": pa.array([], pa.int32()),
                }
            )
        )
        assert _roots(video_near_dedup(empty)) == {}

    def test_identical_videos_one_cluster(self):
        rng = np.random.RandomState(11)
        pix = rng.randint(0, 256, size=(10, 16, 16), dtype=np.uint8)
        t = pa.table(
            {
                "video_id": pa.array([f"vid-{i:09d}" for i in range(5)]),
                "bytes": pa.array([pix.tobytes()] * 5, pa.binary()),
                "fmt": pa.array(["rawv"] * 5),
                "n_frames": pa.array([10] * 5, pa.int32()),
                "w": pa.array([16] * 5, pa.int32()),
                "h": pa.array([16] * 5, pa.int32()),
            }
        )
        roots = _roots(video_near_dedup(ray.data.from_arrow(t)))
        assert set(roots.values()) == {0} and len(roots) == 5

    def test_unknown_format_raises(self):
        stage = VideoPhashPostingsStage()
        bad = pa.table(
            {
                "row_id": pa.array([0], pa.int64()),
                "video_id": pa.array(["vid-000000000"]),
                "bytes": pa.array([b"\x00" * 64], pa.binary()),
                "fmt": pa.array(["mp4"]),
                "n_frames": pa.array([1], pa.int32()),
                "w": pa.array([8], pa.int32()),
                "h": pa.array([8], pa.int32()),
            }
        )
        with pytest.raises(NotImplementedError):
            stage(bad)

    def test_payload_size_mismatch_raises(self):
        stage = VideoPhashPostingsStage()
        bad = pa.table(
            {
                "row_id": pa.array([0], pa.int64()),
                "video_id": pa.array(["vid-000000000"]),
                "bytes": pa.array([b"\x00" * 63], pa.binary()),
                "fmt": pa.array(["rawv"]),
                "n_frames": pa.array([1], pa.int32()),
                "w": pa.array([8], pa.int32()),
                "h": pa.array([8], pa.int32()),
            }
        )
        with pytest.raises(ValueError):
            stage(bad)
