"""Audio near-dup (window-fingerprint-set Jaccard + CC) and its tiered
variant: planted-truth recovery, DuckDB-oracle parity (the driver gate's
SQL), full-rerun equivalence incl. an old-cluster bridge merge, and
degenerate inputs."""

from __future__ import annotations

import glob
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.data.gen import audio_parquet
from text_dedup_ray.pipelines.audio import (
    AUDIO_WINDOW,
    AudioFingerprintPostingsStage,
    audio_near_dedup,
    audio_window_stats,
    window_fingerprints,
)
from text_dedup_ray.pipelines.incremental_audio import audio_bootstrap, audio_increment
from text_dedup_ray.stages.cc import cluster_map_table

T = 0.7
AUDIO_COLS = ["audio_id", "bytes", "fmt", "n_samples", "sr"]

_WINS = {
    i: np.random.RandomState(2000 + i).randint(
        0, 256, size=AUDIO_WINDOW, dtype=np.uint8
    )
    for i in range(64)
}


def _track(aid: int, win_ids: list[int]) -> dict:
    pcm = np.concatenate([_WINS[i] for i in win_ids])
    return {
        "audio_id": f"aud-{aid:09d}",
        "bytes": pcm.tobytes(),
        "fmt": "rawa",
        "n_samples": len(pcm),
        "sr": 16000,
    }


def _tbl(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "audio_id": pa.array([r["audio_id"] for r in rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "n_samples": pa.array([r["n_samples"] for r in rows], pa.int64()),
            "sr": pa.array([r["sr"] for r in rows], pa.int32()),
        }
    )


def _roots(parents) -> dict[int, int]:
    t = cluster_map_table(parents)
    if isinstance(t, ray.data.Dataset):
        t = pa.concat_tables(ray.get(t.to_arrow_refs()))
    return dict(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))


def _nontrivial(parents) -> dict[int, int]:
    return {m: r for m, r in _roots(parents).items() if m != r}


def _state_clusters(state_dir: str, version: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for f in glob.glob(f"{state_dir}/v{version:05d}/clusters/*.parquet"):
        t = pq.read_table(f)
        out.update(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))
    return out


class TestAudioFingerprints:
    def test_ground_truth_matches_bytes(self):
        from text_dedup_ray.data.gen import generate_audio

        audio, _ = generate_audio(30, seed=11)
        for row in audio.to_pylist():
            pcm = np.frombuffer(row["bytes"], np.uint8)
            assert list(window_fingerprints(pcm)) == row["window_hashes"]

    def test_partial_trailing_window_dropped(self):
        pcm = np.concatenate([_WINS[0], _WINS[1][:100]])
        assert len(window_fingerprints(pcm)) == 1
        assert window_fingerprints(pcm)[0] == window_fingerprints(_WINS[0])[0]

    def test_too_short_track(self):
        assert len(window_fingerprints(_WINS[0][:500])) == 0


class TestAudioNearDedup:
    def test_planted_truth_recovered(self):
        ap, tp = audio_parquet(200, seed=11, cache_dir="/tmp/tdr_atest")
        ds = ray.data.read_parquet(ap, columns=AUDIO_COLS)
        roots = _roots(audio_near_dedup(ds, threshold=0.5))
        truth = pq.read_table(tp)
        rids = [int(v[4:]) for v in truth["audio_id"].to_pylist()]
        by_cluster: dict[int, list[tuple[int, str]]] = {}
        for rid, cid, kind in zip(
            rids, truth["cluster_id"].to_pylist(), truth["kind"].to_pylist()
        ):
            by_cluster.setdefault(cid, []).append((rid, kind))
        cluster_of = {}
        for cid, members in by_cluster.items():
            kind = members[0][1]
            got = {roots.get(r, r) for r, _ in members}
            if kind in ("exact", "clipped", "re-noised") and len(members) > 1:
                assert len(got) == 1, (kind, members, got)
            if kind == "near-miss" and len(members) > 1:
                assert len(got) == len(members), (members, got)
            for r, _ in members:
                cluster_of[r] = cid
        seen: dict[int, int] = {}
        for r in rids:
            root = roots.get(r, r)
            assert seen.setdefault(root, cluster_of[r]) == cluster_of[r]

    def test_matches_duckdb_oracle(self):
        import duckdb

        from text_dedup_ray.oracles import audio_near_dedup_sql

        ap, _ = audio_parquet(200, seed=11, cache_dir="/tmp/tdr_atest")
        ds = ray.data.read_parquet(ap, columns=AUDIO_COLS)
        ours = (
            cluster_map_table(audio_near_dedup(ds, threshold=0.5))
            .to_pandas()
            .sort_values(["row_id", "cluster_id"])
            .reset_index(drop=True)
        )
        theirs = (
            duckdb.connect()
            .execute(audio_near_dedup_sql(ap, threshold=0.5))
            .fetchdf()
            .sort_values(["row_id", "cluster_id"])
            .reset_index(drop=True)
        )
        assert ours.equals(theirs.astype(ours.dtypes.to_dict()))

    def test_window_stats_matches_oracle(self):
        import duckdb

        from text_dedup_ray.oracles import audio_window_stats_sql

        ap, _ = audio_parquet(200, seed=11, cache_dir="/tmp/tdr_atest")
        ours = (
            audio_window_stats(ray.data.read_parquet(ap))
            .to_pandas()
            .sort_values("audio_id")
            .reset_index(drop=True)
        )
        theirs = (
            duckdb.connect()
            .execute(audio_window_stats_sql(ap))
            .fetchdf()
            .sort_values("audio_id")
            .reset_index(drop=True)
        )
        assert ours.equals(theirs.astype(ours.dtypes.to_dict()))

    def test_empty_dataset(self):
        empty = ray.data.from_arrow(_tbl([]))
        assert _roots(audio_near_dedup(empty)) == {}

    def test_unknown_format_raises(self):
        stage = AudioFingerprintPostingsStage()
        bad = _tbl([{**_track(0, [0, 1]), "fmt": "mp3"}]).append_column(
            "row_id", pa.array([0], pa.int64())
        )
        with pytest.raises(NotImplementedError):
            stage(bad)

    def test_payload_size_mismatch_raises(self):
        stage = AudioFingerprintPostingsStage()
        row = _track(0, [0, 1])
        row["n_samples"] = row["n_samples"] + 7
        bad = _tbl([row]).append_column("row_id", pa.array([0], pa.int64()))
        with pytest.raises(ValueError):
            stage(bad)


class TestTieredAudio:
    def _corpus(self):
        """Old: near-dup pair + two bridge targets 0.667-similar (< T=0.7) +
        unique. New: cross-batch near-dup, new-new pair, a BRIDGE track
        0.727-similar to both targets."""
        old = [
            _track(0, list(range(20))),
            _track(1, list(range(18)) + [50, 51]),               # J=0.818
            _track(2, list(range(20, 36)) + [52, 53, 54, 55]),   # target 1
            _track(3, list(range(20, 36)) + [56, 57, 58, 59]),   # J(2,3)=0.667
            _track(4, list(range(36, 50))),
        ]
        new = [
            _track(100, list(range(19)) + [60]),                 # J(100,0)=0.905
            _track(102, list(range(18)) + [52, 53]),             # new-new pair
            _track(103, list(range(18)) + [54, 55]),             # J(102,103)=0.818
            _track(104, list(range(20, 38))),                    # bridge: J=0.727 to 2 AND 3
        ]
        return old, new

    def test_increment_equals_full_rerun(self):
        old, new = self._corpus()
        state = tempfile.mkdtemp(prefix="aud_state_", dir="/tmp")
        audio_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, threshold=T, num_partitions=4
        )
        inc = audio_increment(ray.data.from_arrow(_tbl(new)), state)
        full = audio_near_dedup(
            ray.data.from_arrow(_tbl(old + new)), threshold=T, num_partitions=4
        )
        got = {
            m: r for m, r in _state_clusters(state, inc.state_version).items()
            if m != r
        }
        assert got == _nontrivial(full)
        assert got.get(3, 3) == got.get(2, 2) == 2  # bridge merged, min-id root

    def test_synthetic_corpus_80_20_equivalence(self):
        import pyarrow.compute as pc

        ap, _ = audio_parquet(150, seed=11, cache_dir="/tmp/tdr_atest")
        ds = ray.data.read_parquet(ap, columns=AUDIO_COLS)

        def split(keep_old: bool):
            def f(t: pa.Table) -> pa.Table:
                rid = pc.cast(pc.utf8_slice_codeunits(t["audio_id"], 4), pa.int64())
                m = pc.less_equal(rid, pa.scalar(119, pa.int64()))
                return t.filter(m if keep_old else pc.invert(m))

            return f

        state = tempfile.mkdtemp(prefix="aud_state_", dir="/tmp")
        audio_bootstrap(
            ds.map_batches(split(True), batch_format="pyarrow"), state,
            threshold=0.5, num_partitions=8,
        )
        inc = audio_increment(
            ds.map_batches(split(False), batch_format="pyarrow"), state
        )
        full = audio_near_dedup(ds, threshold=0.5, num_partitions=8)
        got = {
            m: r for m, r in _state_clusters(state, inc.state_version).items()
            if m != r
        }
        assert got == _nontrivial(full)

    def test_wrong_state_algo_rejected(self):
        from text_dedup_ray.pipelines.incremental_video import video_bootstrap

        pix = np.random.RandomState(5).randint(0, 256, (4, 16, 16), np.uint8)
        vids = pa.table(
            {
                "video_id": pa.array(["vid-000000000"], pa.string()),
                "bytes": pa.array([pix.tobytes()], pa.binary()),
                "fmt": pa.array(["rawv"]),
                "n_frames": pa.array([4], pa.int32()),
                "w": pa.array([16], pa.int32()),
                "h": pa.array([16], pa.int32()),
            }
        )
        state = tempfile.mkdtemp(prefix="vid_state_", dir="/tmp")
        video_bootstrap(ray.data.from_arrow(vids), state, num_partitions=2)
        old, _ = self._corpus()
        with pytest.raises(ValueError, match="audio_fp_posting"):
            audio_increment(ray.data.from_arrow(_tbl(old)), state)
