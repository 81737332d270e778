"""Tiered editdist state: bootstrap + increments must equal a full
token_ed1_dedup re-run over the union corpus."""

import numpy as np
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.editdist import token_ed1_dedup
from text_dedup_ray.pipelines.incremental_editdist import (
    editdist_bootstrap,
    editdist_increment,
)
from text_dedup_ray.pipelines.incremental import load_meta


def _corpus(n=400, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(n):
        toks = list(rng.choice(vocab, rng.integers(2, 8)))
        texts.append(" ".join(toks))
    # plant structure: exact dups + one-token edits ACROSS split points
    texts[10] = texts[5]
    texts[n - 50] = texts[5]                    # late exact dup of early
    texts[n - 49] = texts[5] + " extra"         # late indel vs early
    t = texts[7].split(" ")
    t[0] = "sub"
    texts[n - 48] = " ".join(t)                 # late substitution vs early
    texts[n - 47] = texts[n - 48]               # late exact dup of late
    if n >= 200:
        texts[n - 120] = texts[3] + " tail"     # middle indel vs early
    return pa.table({"rid": list(range(n)), "text": texts})


def _full_map(tbl):
    parents = token_ed1_dedup(ray.data.from_arrow(tbl), "rid", "text")
    return dict(parents) if isinstance(parents, dict) else {
        int(r.row_id): int(r.cluster_id) for r in parents.to_pandas().itertuples()
    }


def _persisted_map(state_dir):
    """The state's full cluster map: every non-trivial (row_id !=
    cluster_id) row in the latest version's clusters dir."""
    import glob

    import pyarrow.parquet as pq

    from text_dedup_ray.pipelines.incremental import _clusters_dir

    v = load_meta(state_dir)["version"]
    out = {}
    for f in glob.glob(f"{_clusters_dir(state_dir, v)}/**/*.parquet", recursive=True):
        t = pq.read_table(f)
        for m, c in zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()):
            out[int(m)] = int(c)
    return {m: c for m, c in out.items() if m != c}


class TestIncrementalEditdist:
    def test_increment_equals_full_rerun(self, tmp_path):
        tbl = _corpus()
        cut = 300
        old = tbl.slice(0, cut)
        new = tbl.slice(cut)
        state = str(tmp_path / "ed_state")
        editdist_bootstrap(
            ray.data.from_arrow(old), state, text_column="text",
            id_column="rid", num_partitions=4,
        )
        editdist_increment(ray.data.from_arrow(new), state, id_column="rid")
        got = _persisted_map(state)
        full = {m: c for m, c in _full_map(tbl).items() if m != c}
        assert got == full
        assert load_meta(state)["version"] == 2

    def test_chained_increments(self, tmp_path):
        tbl = _corpus(300, seed=9)
        state = str(tmp_path / "ed_state2")
        editdist_bootstrap(
            ray.data.from_arrow(tbl.slice(0, 150)), state,
            text_column="text", id_column="rid", num_partitions=4,
        )
        editdist_increment(
            ray.data.from_arrow(tbl.slice(150, 75)), state, id_column="rid"
        )
        editdist_increment(
            ray.data.from_arrow(tbl.slice(225)), state, id_column="rid"
        )
        got = _persisted_map(state)
        full = {m: c for m, c in _full_map(tbl).items() if m != c}
        assert got == full
        assert load_meta(state)["version"] == 3

    def test_id_validation(self, tmp_path):
        import pytest

        tbl = _corpus(50, seed=2)
        state = str(tmp_path / "ed_state3")
        editdist_bootstrap(
            ray.data.from_arrow(tbl), state, text_column="text",
            id_column="rid", num_partitions=2,
        )
        with pytest.raises(Exception, match="max_row_id"):
            editdist_increment(ray.data.from_arrow(tbl), state, id_column="rid")
