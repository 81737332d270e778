"""Video frame-sampling stage: deterministic 'rawv' container end-to-end.

The reference has no video path; this is part of the engine's multimodal
surface (opaque binary + typed metadata, actor-pool decode stages). The
container is synthetic — concatenated w*h-byte grayscale frames — so the
decode is exact and the Ray plumbing (schema, explode, batching) is real.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.images import FrameSampleStage, sample_video_frames


def _make_video(vid: int, n_frames: int, w: int = 8, h: int = 6) -> dict:
    rng = np.random.RandomState(vid)
    frames = rng.randint(0, 256, size=(n_frames, h * w), dtype=np.uint8)
    return {
        "video_id": f"vid-{vid:06d}",
        "bytes": frames.tobytes(),
        "fmt": "rawv",
        "n_frames": n_frames,
        "w": w,
        "h": h,
    }


def _table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "video_id": pa.array([r["video_id"] for r in rows]),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "fmt": pa.array([r["fmt"] for r in rows]),
            "n_frames": pa.array([r["n_frames"] for r in rows], pa.int32()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
        }
    )


class TestFrameSampling:
    def test_explodes_sampled_frames(self):
        rows = [_make_video(1, 90), _make_video(2, 31), _make_video(3, 1)]
        out = sample_video_frames(
            ray.data.from_arrow(_table(rows)), every_n=30
        ).to_pandas()
        # 90 frames -> idx 0,30,60; 31 -> 0,30; 1 -> 0
        assert sorted(out["frame_idx"].tolist()) == sorted([0, 30, 60, 0, 30, 0])
        assert set(out["video_id"]) == {"vid-000001", "vid-000002", "vid-000003"}

    def test_frame_bytes_exact(self):
        v = _make_video(7, 61, w=4, h=3)
        out = FrameSampleStage(every_n=30)(_table([v]))
        frame_size = 4 * 3
        blob = v["bytes"]
        got = dict(zip(out["frame_idx"].to_pylist(), out["bytes"].to_pylist()))
        for i in (0, 30, 60):
            assert got[i] == blob[i * frame_size : (i + 1) * frame_size]
        assert out["w"].to_pylist() == [4, 4, 4]
        assert out["h"].to_pylist() == [3, 3, 3]

    def test_every_frame_when_n_is_1(self):
        v = _make_video(9, 5)
        out = FrameSampleStage(every_n=1)(_table([v]))
        assert out["frame_idx"].to_pylist() == [0, 1, 2, 3, 4]

    def test_unknown_format_raises(self):
        v = _make_video(1, 10)
        v["fmt"] = "h264"
        with pytest.raises(NotImplementedError):
            FrameSampleStage()(_table([v]))

    def test_corrupt_length_raises(self):
        v = _make_video(1, 10)
        v["bytes"] = v["bytes"][:-1]
        with pytest.raises(ValueError):
            FrameSampleStage()(_table([v]))

    def test_frames_feed_image_stages(self):
        # sampled frames carry (bytes, w, h) — phash them like images
        from text_dedup_ray.functions.codecs import average_phash

        v = _make_video(4, 30, w=8, h=8)
        out = FrameSampleStage(every_n=30)(_table([v]))
        pix = np.frombuffer(out["bytes"][0].as_py(), dtype=np.uint8).reshape(8, 8, 1)
        assert isinstance(average_phash(pix), int)
