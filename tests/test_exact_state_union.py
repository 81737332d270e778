"""exact_state_union: merging two independently-built exact-dedup states
must equal one bootstrap over the union corpus (index files and cluster
membership), including when an input state carries multi-version additive
cluster history; the merged state keeps accepting increments; guards refuse
mismatched configs / partition counts / overlapping id ranges."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.pipelines.incremental import load_meta
from text_dedup_ray.pipelines.incremental_exact import (
    exact_bootstrap,
    exact_increment,
    exact_state_union,
)

P = 4


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )


def _clusters_map(state_dir):
    out = {}
    for f in glob.glob(f"{state_dir}/v*/clusters/*.parquet"):
        t = pq.read_table(f)
        for r, c in zip(
            t["row_id"].to_numpy(zero_copy_only=False).tolist(),
            t["cluster_id"].to_numpy(zero_copy_only=False).tolist(),
        ):
            assert out.get(r, c) == c, f"row {r} has two cluster ids"
            out[r] = c
    return out


def _index_map(state_dir, version):
    out = {}
    for f in sorted(glob.glob(f"{state_dir}/v{version:05d}/index/*.parquet")):
        t = pq.read_table(f)
        for h, w in zip(t["hash"].to_pylist(), t["winner"].to_pylist()):
            out[h] = w
    return out


def test_exact_union_equals_full_bootstrap(tmp_path):
    a = [(0, "alpha"), (1, "beta"), (2, "alpha"), (3, "gamma")]
    b = [(10, "alpha"), (11, "delta"), (12, "gamma"), (13, "delta")]
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    exact_bootstrap(_ds(a), sa, id_column="doc_id", num_partitions=P)
    exact_bootstrap(_ds(b), sb, id_column="doc_id", num_partitions=P)
    version, merges = exact_state_union(sa, sb, su)
    assert version == 1
    exact_bootstrap(_ds(a + b), sf, id_column="doc_id", num_partitions=P)

    assert _index_map(su, 1) == _index_map(sf, 1)
    assert _clusters_map(su) == _clusters_map(sf)
    # cross-state collisions: B's alpha winner (10) and gamma winner (12)
    assert merges == {10: 0, 12: 3}
    assert load_meta(su)["max_row_id"] == 13


def test_exact_union_with_multiversion_history(tmp_path):
    """State A has bootstrap + increment history (additive cluster dirs);
    union must fold ALL of it."""
    a0 = [(0, "alpha"), (1, "beta")]
    a1 = [(5, "alpha"), (6, "epsilon")]  # 5 dups old 0 -> cluster row in v2
    b = [(10, "beta"), (11, "epsilon"), (12, "zeta")]
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    exact_bootstrap(_ds(a0), sa, id_column="doc_id", num_partitions=P)
    exact_increment(_ds(a1), sa, id_column="doc_id")
    exact_bootstrap(_ds(b), sb, id_column="doc_id", num_partitions=P)
    _, merges = exact_state_union(sa, sb, su)
    exact_bootstrap(_ds(a0 + a1 + b), sf, id_column="doc_id", num_partitions=P)

    assert _index_map(su, 1) == _index_map(sf, 1)
    assert _clusters_map(su) == _clusters_map(sf)
    assert merges == {10: 1, 11: 6}

    # the union state chains: increment equals the full rerun's tail
    c = [(20, "alpha"), (21, "new content never seen")]
    inc_u = exact_increment(_ds(c), su, id_column="doc_id")
    assert sorted(r["doc_id"] for r in inc_u.deduped.take_all()) == [21]
    assert _clusters_map(su).get(20) == 0


def test_exact_union_guards(tmp_path):
    a = [(0, "alpha")]
    sa = str(tmp_path / "a")
    exact_bootstrap(_ds(a), sa, id_column="doc_id", num_partitions=P)

    sc = str(tmp_path / "c")
    exact_bootstrap(
        _ds([(10, "beta")]), sc, id_column="doc_id", num_partitions=P,
        text_column="text",
    )
    # different text column -> different cfg hash
    sd = str(tmp_path / "d")
    ds_other = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([20], pa.int64()), "body": ["x"], "text": ["x"]}
        )
    )
    exact_bootstrap(ds_other, sd, id_column="doc_id", text_column="body",
                    num_partitions=P)
    with pytest.raises(ValueError, match="different text columns"):
        exact_state_union(sa, sd, str(tmp_path / "u1"))

    sp = str(tmp_path / "p")
    exact_bootstrap(_ds([(30, "x y")]), sp, id_column="doc_id",
                    num_partitions=P * 2)
    with pytest.raises(ValueError, match="different partition counts"):
        exact_state_union(sa, sp, str(tmp_path / "u2"))

    so = str(tmp_path / "o")
    exact_bootstrap(_ds([(0, "overlap")]), so, id_column="doc_id",
                    num_partitions=P)
    with pytest.raises(ValueError, match="row-id intervals overlap"):
        exact_state_union(sa, so, str(tmp_path / "u3"))
