"""embedding_state_union: merging two independently-built embedding-LSH
states must equal one bootstrap over the union corpus (identical cluster
membership — same hyperplanes, cross-state cosine verification), the merged
state must keep accepting increments, and guards refuse mismatched configs /
overlapping ids."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.pipelines.incremental import load_meta
from text_dedup_ray.pipelines.incremental_embedding import (
    embedding_bootstrap,
    embedding_increment,
    embedding_state_union,
)

DIM = 16
THRESH = 0.95
P = 4
KW = dict(threshold=THRESH, num_tables=8, num_bits=6, seed=42,
          num_partitions=P)


def _vecs(ids, mat):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float32())
                ),
            }
        )
    )


def _corpus():
    """A side 0..19, B side 100..119; cross dups 3~103 (exact copy) and
    11~111 (0.99-blend near-dup), within-side dups on each side."""
    rng = np.random.RandomState(9)
    a = rng.randn(20, DIM).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    a[7] = a[2]  # within-A dup -> root 2
    b = rng.randn(20, DIM).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    b[3] = a[3]  # cross exact dup: 103 ~ 3
    near = 0.97 * a[11] + 0.03 * b[15]
    b[11] = near / np.linalg.norm(near)  # cross near-dup: 111 ~ 11
    b[9] = b[5]  # within-B dup -> root 105
    return list(range(20)), a, [100 + i for i in range(20)], b


def _clusters_map(state_dir, version):
    out = {}
    for f in glob.glob(f"{state_dir}/v{version:05d}/clusters/*.parquet"):
        t = pq.read_table(f)
        for r, c in zip(
            t["row_id"].to_numpy(zero_copy_only=False).tolist(),
            t["cluster_id"].to_numpy(zero_copy_only=False).tolist(),
        ):
            assert out.get(r, c) == c, f"row {r} has two cluster ids"
            out[r] = c
    return out


def test_embedding_union_equals_full_bootstrap(tmp_path):
    aid, avec, bid, bvec = _corpus()
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    embedding_bootstrap(_vecs(aid, avec), sa, id_column="vec_id", **KW)
    embedding_bootstrap(_vecs(bid, bvec), sb, id_column="vec_id", **KW)
    version, merges = embedding_state_union(sa, sb, su)
    assert version == 1
    embedding_bootstrap(
        _vecs(aid + bid, np.vstack([avec, bvec])), sf, id_column="vec_id", **KW
    )

    got, want = _clusters_map(su, 1), _clusters_map(sf, 1)
    assert got == want
    # exact cross dup and near cross dup both merged
    assert want[103] == 3 and want[111] == 11
    assert merges.get(103, want[103]) == 3
    assert load_meta(su)["max_row_id"] == 119


def test_embedding_union_chains_increments(tmp_path):
    aid, avec, bid, bvec = _corpus()
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    embedding_bootstrap(_vecs(aid, avec), sa, id_column="vec_id", **KW)
    embedding_bootstrap(_vecs(bid, bvec), sb, id_column="vec_id", **KW)
    embedding_state_union(sa, sb, su)
    embedding_bootstrap(
        _vecs(aid + bid, np.vstack([avec, bvec])), sf, id_column="vec_id", **KW
    )

    rng = np.random.RandomState(21)
    cvec = np.vstack(
        [avec[2], rng.randn(DIM).astype(np.float32)]
    )
    cvec /= np.linalg.norm(cvec, axis=1, keepdims=True)
    cid = [200, 201]
    inc_u = embedding_increment(_vecs(cid, cvec), su, id_column="vec_id")
    inc_f = embedding_increment(_vecs(cid, cvec), sf, id_column="vec_id")
    assert inc_u.state_version == inc_f.state_version == 2
    assert _clusters_map(su, 2) == _clusters_map(sf, 2)
    assert _clusters_map(su, 2)[200] == 2


def test_embedding_union_guards(tmp_path):
    aid, avec, bid, bvec = _corpus()
    sa = str(tmp_path / "a")
    embedding_bootstrap(_vecs(aid, avec), sa, id_column="vec_id", **KW)

    st = str(tmp_path / "t")
    other = dict(KW, seed=7)
    embedding_bootstrap(_vecs(bid, bvec), st, id_column="vec_id", **other)
    with pytest.raises(ValueError, match="different LSH configs"):
        embedding_state_union(sa, st, str(tmp_path / "u1"))

    so = str(tmp_path / "o")
    embedding_bootstrap(_vecs(aid, avec), so, id_column="vec_id", **KW)
    with pytest.raises(ValueError, match="row-id intervals overlap"):
        embedding_state_union(sa, so, str(tmp_path / "u2"))
