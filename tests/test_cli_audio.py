"""Fresh-process CLI smoke for the audio modes: batch ``audio_dedup`` and
tiered ``audio_incremental``."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow.parquet as pq


def _audio_path() -> str:
    import sys as _s

    _s.path.insert(0, "/root/repo")
    from text_dedup_ray.data.gen import audio_parquet

    path, _ = audio_parquet(150, seed=11, cache_dir="/tmp/tdr_atest")
    return path


def _run(config_path) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "text_dedup_ray", "--config", str(config_path)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_audio_dedup(tmp_path):
    ap = _audio_path()
    n = pq.read_metadata(ap).num_rows
    cfg = tmp_path / "run.toml"
    cfg.write_text(
        f"""
[input]
path = "{ap}"

[output]
path = "{tmp_path / "out"}"

[algorithm]
name = "audio_dedup"
threshold = 0.5
"""
    )
    stats = _run(cfg)
    assert stats["algorithm"] == "audio_dedup"
    out = pq.read_table(str(tmp_path / "out"))
    assert 0 < out.num_rows < n
    assert "audio_id" in out.schema.names


def test_cli_audio_incremental(tmp_path):
    ap = _audio_path()
    t = pq.read_table(ap)
    cut = int(t.num_rows * 0.7)
    pq.write_table(t.slice(0, cut), tmp_path / "old.parquet")
    pq.write_table(t.slice(cut), tmp_path / "new.parquet")
    state = tmp_path / "aud_state"

    def cfg(inp, out):
        return f"""
[input]
path = "{tmp_path / inp}"

[output]
path = "{tmp_path / out}"

[algorithm]
name = "audio_incremental"
state_dir = "{state}"
threshold = 0.5
"""

    c1, c2 = tmp_path / "boot.toml", tmp_path / "inc.toml"
    c1.write_text(cfg("old.parquet", "out1"))
    c2.write_text(cfg("new.parquet", "out2"))
    s1 = _run(c1)
    assert s1["mode"] == "bootstrap" and s1["state_version"] == 1
    s2 = _run(c2)
    assert s2["mode"] == "increment" and s2["state_version"] == 2
    assert 0 < pq.read_table(str(tmp_path / "out1")).num_rows <= cut
    assert 0 < pq.read_table(str(tmp_path / "out2")).num_rows <= t.num_rows - cut
