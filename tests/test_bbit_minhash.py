"""b-bit minwise hashing (Li & König WWW'10): minhash_dedup(b_bits=...)
bands the lowest 8/16 bits of each permutation value. Properties checked:
truncated banding strictly COARSENS the full-width clustering at the same
(bands, rows) config (every full-width duplicate pair stays co-clustered),
the DuckDB masked-oracle reproduces the engine bit-for-bit, and invalid
widths raise."""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.oracles import minhash_bbit_dedup_sql
from text_dedup_ray.pipelines.minhash import minhash_dedup


def _corpus(n=150, seed=7):
    rng = random.Random(seed)
    vocab = [f"w{c}" for c in range(300)]
    texts = [" ".join(rng.choice(vocab) for _ in range(16)) for _ in range(n)]
    for i in range(0, min(45, n - 2), 3):
        texts[i + 1] = texts[i]  # exact dup
        words = texts[i].split()
        words[3], words[11] = "zza", "zzb"
        texts[i + 2] = " ".join(words)  # near dup
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})


def _roots(res) -> dict[int, int]:
    parents = res.parents
    assert isinstance(parents, dict)

    def root(x):
        while parents.get(x, x) != x:
            x = parents[x]
        return x

    return {m: root(m) for m in parents}


CFG = dict(num_perm=32, bands=8, rows=4, hash_func="md5", ngram_size=2)


@pytest.mark.parametrize("b_bits", [8, 16])
def test_bbit_coarsens_full_width(b_bits):
    t = _corpus()
    full = _roots(
        minhash_dedup(
            ray.data.from_arrow(t), id_column="doc_id", cfg=MinHashConfig(**CFG)
        )
    )
    trunc = _roots(
        minhash_dedup(
            ray.data.from_arrow(t),
            id_column="doc_id",
            cfg=MinHashConfig(**CFG),
            b_bits=b_bits,
        )
    )
    # some duplicates must exist for the test to mean anything
    full_pairs = [(m, r) for m, r in full.items() if m != r]
    assert full_pairs
    # every full-width co-clustered pair stays co-clustered after truncation
    for m, r in full_pairs:
        assert trunc.get(m, m) == trunc.get(r, r), (m, r, b_bits)


def test_bbit_oracle_parity_duckdb():
    t = _corpus(n=120, seed=21)
    cfg = MinHashConfig(**CFG)
    res = minhash_dedup(
        ray.data.from_arrow(t), id_column="doc_id", cfg=cfg, b_bits=8
    )
    df = (
        res.deduped.select_columns(["doc_id", "__CLUSTER__"])
        .rename_columns({"__CLUSTER__": "cluster_id"})
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    odf = (
        con.execute(minhash_bbit_dedup_sql(cfg, b_bits=8))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(df) == len(odf)
    assert (df["doc_id"].values == odf["doc_id"].values).all()
    assert (df["cluster_id"].values == odf["cluster_id"].values).all()


def test_bbit_rejects_unaligned_width():
    t = _corpus(n=20)
    with pytest.raises(ValueError, match="b_bits"):
        minhash_dedup(
            ray.data.from_arrow(t),
            id_column="doc_id",
            cfg=MinHashConfig(**CFG),
            b_bits=5,
        ).deduped.count()
