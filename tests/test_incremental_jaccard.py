"""Tiered exact n-gram Jaccard dedup: bootstrap(old) then increment(new)
must land on EXACTLY the cluster map ``ngram_jaccard_dedup(old ∪ new)``
produces — cross-batch near-dups, new-new pairs, and a new doc BRIDGING two
old clusters (old-root merge)."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.pipelines.incremental_jaccard import (
    jaccard_bootstrap,
    jaccard_increment,
)
from text_dedup_ray.pipelines.jaccard_dedup import ngram_jaccard_dedup

T = 0.7
CFG = dict(ngram_size=1, min_length=0, threshold=T)


def _words(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def _corpus():
    """Word-set docs. Old: two near-dup pairs sharing 18/20 words + uniques.
    New: a near-dup of old doc 0, a new-new pair, a unique, and a BRIDGE doc
    0.818-similar to two old docs that are only 0.667-similar to each other
    (below T=0.7, so they merge only via the bridge)."""
    base = _words("b", 16)
    old = {
        0: _words("a", 20),
        1: _words("a", 18) + ["z1", "z2"],          # J(0,1)=18/22=0.818
        2: _words("c", 20),
        3: _words("c", 18) + ["z3", "z4"],          # J(2,3)=0.818
        4: base + _words("x", 4),                   # bridge target 1
        5: base + _words("y", 4),                   # J(4,5)=16/24=0.667 < T
        6: _words("u", 25),
        7: _words("v", 25),
    }
    new = {
        100: _words("a", 19) + ["q1"],              # J(100,0)=19/21=0.905
        101: _words("n", 22),                       # unique
        102: _words("m", 20),                       # new-new pair
        103: _words("m", 18) + ["q2", "q3"],        # J(102,103)=0.818
        104: base + ["x0", "x1", "y0", "y1"],       # bridge: J=18/22 to 4 AND 5
    }
    return old, new


def _tbl(d):
    return pa.table(
        {
            "doc_id": pa.array(sorted(d), pa.int64()),
            "text": pa.array([" ".join(d[k]) for k in sorted(d)], pa.string()),
        }
    )


def _nontrivial(parents) -> dict[int, int]:
    if isinstance(parents, ray.data.Dataset):
        df = parents.to_pandas()
        parents = dict(zip(df["row_id"], df["cluster_id"]))
    return {int(m): int(r) for m, r in parents.items() if m != r}


def _state_clusters(state_dir: str, version: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for f in glob.glob(f"{state_dir}/v{version:05d}/clusters/*.parquet"):
        t = pq.read_table(f)
        out.update(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))
    return out


def _full(old, new):
    both = pa.concat_tables([_tbl(old), _tbl(new)])
    return ngram_jaccard_dedup(
        ray.data.from_arrow(both), id_column="doc_id",
        df_cap=1_000_000_000, **CFG,
    )


class TestJaccardIncremental:
    def test_single_increment_equals_full_batch(self, tmp_path):
        old, new = _corpus()
        full = _full(old, new)
        state = str(tmp_path / "state")
        jaccard_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, id_column="doc_id",
            num_partitions=8, df_cap=1_000_000_000, **CFG,
        )
        inc = jaccard_increment(ray.data.from_arrow(_tbl(new)), state, id_column="doc_id")
        got = _state_clusters(state, inc.state_version)
        assert got == _nontrivial(full)
        assert got[100] == 0        # cross-batch near-dup
        assert got[103] == 102      # new-new pair
        assert got[104] == 4 and got[5] == 4  # bridge merged {4} and {5}
        assert inc.merged_old_roots

    def test_chained_increments(self, tmp_path):
        old, new = _corpus()
        full = _full(old, new)
        state = str(tmp_path / "state")
        jaccard_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, id_column="doc_id",
            num_partitions=8, df_cap=1_000_000_000, **CFG,
        )
        first = {k: new[k] for k in (100, 101, 102)}
        second = {k: new[k] for k in (103, 104)}
        inc1 = jaccard_increment(ray.data.from_arrow(_tbl(first)), state, id_column="doc_id")
        inc2 = jaccard_increment(ray.data.from_arrow(_tbl(second)), state, id_column="doc_id")
        assert _state_clusters(state, inc2.state_version) == _nontrivial(full)
        assert inc2.state_version == inc1.state_version + 1

    def test_forced_distributed_matches(self, tmp_path):
        old, new = _corpus()
        full = _full(old, new)
        state = str(tmp_path / "state")
        jaccard_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, id_column="doc_id",
            num_partitions=8, df_cap=1_000_000_000, driver_threshold=0, **CFG,
        )
        inc = jaccard_increment(
            ray.data.from_arrow(_tbl(new)), state, id_column="doc_id",
            driver_threshold=0,
        )
        assert isinstance(inc.parents, ray.data.Dataset)
        assert _state_clusters(state, inc.state_version) == _nontrivial(full)

    def test_id_and_meta_guards(self, tmp_path):
        old, _ = _corpus()
        state = str(tmp_path / "state")
        jaccard_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, id_column="doc_id",
            df_cap=1_000_000_000, **CFG,
        )
        with pytest.raises(ValueError, match="max_row_id"):
            jaccard_increment(ray.data.from_arrow(_tbl(old)), state, id_column="doc_id")


class TestJaccardIncrementSkew:
    def test_hot_shingle_capped_and_logged(self, tmp_path, caplog):
        """A shingle shared by every doc (combined df above df_cap) is
        dropped with a warning, not a quadratic blowup; distinctive shingles
        still pair up."""
        import logging

        old = {i: [f"o{i}_{j}" for j in range(10)] + ["hot"] for i in range(30)}
        new = {
            100: [f"o5_{j}" for j in range(10)] + ["hot"],  # near-dup of old 5
            101: [f"n1_{j}" for j in range(12)] + ["hot"],  # unique + hot
        }
        state = str(tmp_path / "state")
        jaccard_bootstrap(
            ray.data.from_arrow(_tbl(old)), state, id_column="doc_id",
            num_partitions=4, df_cap=8, ngram_size=1, min_length=0, threshold=0.7,
        )
        with caplog.at_level(logging.WARNING):
            inc = jaccard_increment(
                ray.data.from_arrow(_tbl(new)), state, id_column="doc_id"
            )
        got = _state_clusters(state, inc.state_version)
        # the dropped hot shingle costs one co-count: co=10 over the 10
        # distinctive shingles, union=11+11-10=12 -> J=10/12=0.83 >= 0.7,
        # so the near-dup pair still clusters without the hot posting list
        assert got.get(100) == 5
        assert 101 not in got  # unique survives as its own root
