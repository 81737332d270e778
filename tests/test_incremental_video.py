"""Tiered video near-dup: bootstrap(old) then increment(new) must land on
EXACTLY the cluster map batch ``video_near_dedup(old ∪ new)`` produces —
cross-batch near-dups, new-new pairs, and a new video BRIDGING two old
clusters that are below-threshold similar to each other."""

from __future__ import annotations

import glob
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.data.gen import videos_parquet
from text_dedup_ray.pipelines.incremental_video import video_bootstrap, video_increment
from text_dedup_ray.pipelines.video import video_near_dedup
from text_dedup_ray.stages.cc import cluster_map_table

T = 0.7
VIDEO_COLS = ["video_id", "bytes", "fmt", "n_frames", "w", "h"]

_FRAMES = {
    i: np.random.RandomState(1000 + i).randint(0, 256, size=(16, 16), dtype=np.uint8)
    for i in range(64)
}


def _video(vid: int, frame_ids: list[int]) -> dict:
    pix = np.stack([_FRAMES[i] for i in frame_ids])
    return {
        "video_id": f"vid-{vid:09d}",
        "bytes": pix.tobytes(),
        "fmt": "rawv",
        "n_frames": len(frame_ids),
        "w": 16,
        "h": 16,
    }


def _tbl(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "video_id": pa.array([r["video_id"] for r in rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "n_frames": pa.array([r["n_frames"] for r in rows], pa.int32()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
        }
    )


def _corpus():
    """Old: a near-dup pair (J=0.818) + two bridge targets only 0.667-similar
    to each other (below T=0.7) + uniques. New: a cross-batch near-dup of old
    video 0, a new-new pair, a unique, and a BRIDGE video 0.818-similar to
    BOTH bridge targets."""
    old = [
        _video(0, list(range(20))),                      # a-cluster root
        _video(1, list(range(18)) + [50, 51]),           # J(0,1)=18/22=0.818
        _video(2, list(range(20, 36)) + [52, 53, 54, 55]),  # bridge target 1
        _video(3, list(range(20, 36)) + [56, 57, 58, 59]),  # J(2,3)=16/24=0.667 < T
        _video(4, list(range(36, 50))),                  # unique
    ]
    new = [
        _video(100, list(range(19)) + [60]),             # J(100,0)=19/21=0.905
        _video(101, [61, 62, 63] + list(range(36, 44))), # J(101,4)=8/17 < T
        _video(102, list(range(18)) + [52, 53]),         # new-new pair w/ 103
        _video(103, list(range(18)) + [54, 55]),         # J(102,103)=18/22=0.818
        _video(104, list(range(20, 38))),                # bridge: J=16/22+... see below
    ]
    # bridge check: video 104 = frames 20..37; vs 2 (20..35 + 52..55):
    # co=16, union=18+20-16=22 -> 0.727 >= T; vs 3 same -> merges 2 and 3.
    return old, new


def _nontrivial(parents) -> dict[int, int]:
    t = cluster_map_table(parents)
    if isinstance(t, ray.data.Dataset):
        t = pa.concat_tables(ray.get(t.to_arrow_refs()))
    return {
        int(m): int(r)
        for m, r in zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist())
        if int(m) != int(r)
    }


def _state_clusters(state_dir: str, version: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for f in glob.glob(f"{state_dir}/v{version:05d}/clusters/*.parquet"):
        t = pq.read_table(f)
        out.update(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))
    return out


class TestTieredVideo:
    def test_increment_equals_full_rerun(self):
        old, new = _corpus()
        state = tempfile.mkdtemp(prefix="vid_state_", dir="/tmp")
        video_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, every_n=1, threshold=T,
            num_partitions=4,
        )
        inc = video_increment(ray.data.from_arrow(_tbl(new)), state)
        full = video_near_dedup(
            ray.data.from_arrow(_tbl(old + new)), every_n=1, threshold=T,
            num_partitions=4,
        )
        want = _nontrivial(full)
        got = {
            m: r for m, r in _state_clusters(state, inc.state_version).items()
            if m != r
        }
        assert got == want
        # the bridge actually fired: 2 and 3 share a root now
        assert got.get(3, 3) == got.get(2, 2) or (2 in got and 3 in got)
        roots = {m: r for m, r in got.items()}
        assert roots.get(3, 3) == roots.get(2, 2) == 2  # min-id root

    def test_synthetic_corpus_80_20_equivalence(self):
        vp, _ = videos_parquet(150, seed=7, cache_dir="/tmp/tdr_vtest")
        ds = ray.data.read_parquet(vp, columns=VIDEO_COLS)
        import pyarrow.compute as pc

        def split(keep_old: bool):
            def f(t: pa.Table) -> pa.Table:
                rid = pc.cast(pc.utf8_slice_codeunits(t["video_id"], 4), pa.int64())
                m = pc.less_equal(rid, pa.scalar(119, pa.int64()))
                return t.filter(m if keep_old else pc.invert(m))

            return f

        state = tempfile.mkdtemp(prefix="vid_state_", dir="/tmp")
        video_bootstrap(
            ds.map_batches(split(True), batch_format="pyarrow"), state,
            every_n=2, threshold=0.5, num_partitions=8,
        )
        inc = video_increment(
            ds.map_batches(split(False), batch_format="pyarrow"), state
        )
        full = video_near_dedup(ds, every_n=2, threshold=0.5, num_partitions=8)
        got = {
            m: r for m, r in _state_clusters(state, inc.state_version).items()
            if m != r
        }
        assert got == _nontrivial(full)

    def test_second_increment(self):
        old, new = _corpus()
        state = tempfile.mkdtemp(prefix="vid_state_", dir="/tmp")
        video_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, every_n=1, threshold=T,
            num_partitions=4,
        )
        video_increment(ray.data.from_arrow(_tbl(new[:2])), state)
        inc2 = video_increment(ray.data.from_arrow(_tbl(new[2:])), state)
        full = video_near_dedup(
            ray.data.from_arrow(_tbl(old + new)), every_n=1, threshold=T,
            num_partitions=4,
        )
        got = {
            m: r for m, r in _state_clusters(state, inc2.state_version).items()
            if m != r
        }
        assert got == _nontrivial(full)

    def test_id_monotonicity_enforced(self):
        old, new = _corpus()
        state = tempfile.mkdtemp(prefix="vid_state_", dir="/tmp")
        video_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, every_n=1, threshold=T,
            num_partitions=4,
        )
        with pytest.raises(ValueError, match="max_row_id"):
            video_increment(ray.data.from_arrow(_tbl(old[:1])), state)

    def test_wrong_state_algo_rejected(self):
        from text_dedup_ray.pipelines.incremental_jaccard import jaccard_bootstrap

        docs = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": pa.array(["a b c", "d e f"], pa.string())}
        )
        state = tempfile.mkdtemp(prefix="jac_state_", dir="/tmp")
        jaccard_bootstrap(
            ray.data.from_arrow(docs), state, id_column="doc_id", num_partitions=2
        )
        _, new = _corpus()
        with pytest.raises(ValueError, match="video_phash_posting"):
            video_increment(ray.data.from_arrow(_tbl(new)), state)
