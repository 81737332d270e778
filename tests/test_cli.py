"""CLI smoke test — config-driven entry point in a fresh process."""

from __future__ import annotations

import json
import subprocess
import sys


def test_cli_minhash(tmp_path):
    config = tmp_path / "run.toml"
    out_dir = tmp_path / "out"
    config.write_text(
        f"""
[input]
path = "/root/testdata/sf0.001/documents.parquet"
text_column = "text"
id_column = "doc_id"

[output]
path = "{out_dir}"

[algorithm]
name = "minhash"
num_perm = 64
bands = 16
rows = 4
ngram_size = 2
hash_func = "sha1"
"""
    )
    proc = subprocess.run(
        [sys.executable, "-m", "text_dedup_ray", "--config", str(config)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["algorithm"] == "minhash" and stats["clusters"] > 0

    import pyarrow.parquet as pq

    t = pq.read_table(str(out_dir))
    assert t.num_rows > 0 and "__CLUSTER__" not in t.column_names
    clusters = pq.read_table(str(out_dir) + ".clusters.parquet")
    assert clusters.num_rows == stats["cluster_members"]
