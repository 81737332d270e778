"""minhash_cross_join: LSH candidate join between two tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.oracles import minhash_cross_join_sql
from text_dedup_ray.pipelines.minhash import minhash_cross_join

CFG = MinHashConfig(num_perm=64, bands=32, rows=2, ngram_size=1, hash_func="md5")


def _ds(texts, ids, blocks=3):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ).repartition(blocks)


def _got(left, right, cfg=CFG, **kw):
    import pandas as pd
    import ray

    out = minhash_cross_join(
        left, right, cfg, left_id="doc_id", right_id="doc_id", **kw
    )
    # to_pandas() on an all-empty Dataset drops columns (Ray quirk) — fetch
    # the typed blocks directly
    tbls = [t for t in map(ray.get, out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pd.DataFrame(columns=["left_id", "right_id"])
    df = pa.concat_tables(tbls).to_pandas()
    return df.sort_values(["left_id", "right_id"]).reset_index(drop=True)


class TestMinHashCrossJoin:
    def test_exact_copies_always_pair_within_side_free(self):
        # min_length default 5 tokens: captions must be >= 5 tokens
        a = "alpha beta gamma delta epsilon zeta"
        b = "one two three four five six seven"
        left = _ds([a, a, b], [1, 2, 3])
        right = _ds([a, "nine ten eleven twelve thirteen fourteen"], [100, 200])
        got = _got(left, right)
        assert {(1, 100), (2, 100)} <= set(zip(got.left_id, got.right_id))
        # same-side exact copies (1,2) never emitted
        assert (got.left_id != got.right_id).all()
        assert set(got.right_id) <= {100, 200}

    def test_disjoint_vocab_no_pairs_strict(self):
        cfg = MinHashConfig(num_perm=64, bands=8, rows=8, ngram_size=1, hash_func="md5")
        left = _ds(["aa bb cc dd ee ff gg"], [1])
        right = _ds(["qq rr ss tt uu vv ww"], [10])
        assert len(_got(left, right, cfg=cfg)) == 0

    def test_partition_count_invariance(self):
        rng = np.random.default_rng(6)
        vocab = [f"w{i}" for i in range(15)]
        mk = lambda: " ".join(rng.choice(vocab, rng.integers(5, 14)))
        left = _ds([mk() for _ in range(40)], list(range(40)))
        right = _ds([mk() for _ in range(10)], list(range(100, 110)))
        a = _got(left, right, num_partitions=1)
        b = _got(left, right, num_partitions=13)
        assert a.equals(b)

    def test_matches_duckdb(self):
        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(5, 15)))
            for _ in range(97 + 40)
        ]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = (
            con.execute(minhash_cross_join_sql(CFG, mod=97))
            .fetchdf()
            .sort_values(["left_id", "right_id"])
            .reset_index(drop=True)
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        mk = lambda L: ds.map_batches(
            lambda t, L=L: t.filter(
                pa.array(
                    (t["doc_id"].to_numpy(zero_copy_only=False) % 97 != 0) == L
                )
            ),
            batch_format="pyarrow",
        )
        got = _got(mk(True), mk(False), max_bucket=10**9)
        assert got.equals(exp[["left_id", "right_id"]])

    def test_max_bucket_skips_hot_bucket(self):
        # every doc identical -> one giant bucket; max_bucket=3 skips it
        a = "alpha beta gamma delta epsilon zeta"
        left = _ds([a] * 5, list(range(5)))
        right = _ds([a] * 2, [100, 101])
        assert len(_got(left, right, max_bucket=3)) == 0
        assert len(_got(left, right, max_bucket=100)) == 10


class TestFuzzyCrossJoin:
    def test_intersection_semantics(self):
        from text_dedup_ray.pipelines.jaccard_dedup import jaccard_cross_join
        from text_dedup_ray.pipelines.minhash import fuzzy_cross_join

        rng = np.random.default_rng(21)
        vocab = [f"w{i}" for i in range(12)]
        mk = lambda: " ".join(rng.choice(vocab, rng.integers(5, 15)))
        lt, rt = [mk() for _ in range(50)], [mk() for _ in range(12)]
        rt[0] = lt[3]  # planted exact copy across sides
        left, right = _ds(lt, list(range(50))), _ds(rt, list(range(100, 112)))

        fz = fuzzy_cross_join(
            left, right, CFG, threshold=0.6,
            left_id="doc_id", right_id="doc_id",
            max_bucket=10**9, df_cap=10**9,
        ).to_pandas()
        cand = minhash_cross_join(
            left, right, CFG, left_id="doc_id", right_id="doc_id",
            max_bucket=10**9,
        ).to_pandas()
        exact = jaccard_cross_join(
            left, right, ngram_size=CFG.ngram_size, min_length=CFG.min_length,
            threshold=0.6, left_id="doc_id", right_id="doc_id", df_cap=10**9,
        ).to_pandas()
        want = set(zip(cand.left_id, cand.right_id)) & set(
            zip(exact.left_id, exact.right_id)
        )
        assert set(zip(fz.left_id, fz.right_id)) == want
        planted = fz[(fz.left_id == 3) & (fz.right_id == 100)]
        assert len(planted) == 1 and planted.jaccard.iloc[0] == 1.0
        # jaccard values match the exact join's
        ex = dict(zip(zip(exact.left_id, exact.right_id), exact.jaccard))
        for row in fz.itertuples():
            assert abs(ex[(row.left_id, row.right_id)] - row.jaccard) < 1e-12

    def test_no_candidates_empty(self):
        from text_dedup_ray.pipelines.minhash import fuzzy_cross_join

        cfg = MinHashConfig(num_perm=64, bands=8, rows=8, ngram_size=1, hash_func="md5")
        left = _ds(["aa bb cc dd ee ff"], [1])
        right = _ds(["qq rr ss tt uu vv"], [10])
        out = fuzzy_cross_join(
            left, right, cfg, threshold=0.5, left_id="doc_id", right_id="doc_id"
        )
        assert out.count() == 0
        assert set(out.schema().names) == {"left_id", "right_id", "jaccard"}
