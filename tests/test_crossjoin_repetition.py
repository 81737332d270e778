"""jaccard_cross_join + with_repetition + filter_by_quantile."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.oracles import jaccard_cross_join_sql, repetition_sql
from text_dedup_ray.pipelines.agg import filter_by_quantile
from text_dedup_ray.pipelines.jaccard_dedup import jaccard_cross_join
from text_dedup_ray.pipelines.textops import with_repetition


def _ds(texts, ids, blocks=3):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ).repartition(blocks)


def _pairs(res):
    df = res.to_pandas().sort_values(["left_id", "right_id"]).reset_index(drop=True)
    return df


class TestJaccardCrossJoin:
    def test_cross_side_only(self):
        # identical docs on the SAME side must not pair; across sides they must
        left = _ds(["aa bb cc", "aa bb cc", "xx yy zz"], [1, 2, 3])
        right = _ds(["aa bb cc", "pp qq rr"], [100, 200])
        got = _pairs(
            jaccard_cross_join(
                left, right, ngram_size=1, threshold=0.99,
                left_id="doc_id", right_id="doc_id",
            )
        )
        assert got.left_id.tolist() == [1, 2]
        assert got.right_id.tolist() == [100, 100]
        assert (got.jaccard == 1.0).all()

    def test_matches_duckdb(self):
        rng = np.random.default_rng(8)
        vocab = [f"w{i}" for i in range(20)]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(2, 12))) for _ in range(97 * 2)
        ]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = (
            con.execute(jaccard_cross_join_sql(1, 0, 0.4, mod=97))
            .fetchdf()
            .sort_values(["left_id", "right_id"])
            .reset_index(drop=True)
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        mk = lambda left: ds.map_batches(
            lambda t, L=left: t.filter(
                pa.array(
                    (t["doc_id"].to_numpy(zero_copy_only=False) % 97 != 0) == L
                )
            ),
            batch_format="pyarrow",
        )
        got = jaccard_cross_join(
            mk(True), mk(False), ngram_size=1, threshold=0.4,
            left_id="doc_id", right_id="doc_id", df_cap=10**9, num_partitions=5,
        ).to_pandas()
        got["jaccard"] = got["jaccard"].round(4)
        got = got.sort_values(["left_id", "right_id"]).reset_index(drop=True)
        assert got.equals(exp)

    def test_partition_count_invariance(self):
        left = _ds(["a b c d", "e f g h", "a b x y"], [1, 2, 3])
        right = _ds(["a b c z", "e f q r"], [10, 20])
        kw = dict(ngram_size=1, threshold=0.2, left_id="doc_id", right_id="doc_id")
        a = _pairs(jaccard_cross_join(left, right, num_partitions=1, **kw))
        b = _pairs(jaccard_cross_join(left, right, num_partitions=11, **kw))
        assert a.equals(b)

    def test_df_cap_drops_hot_shingle(self):
        # 'hot' is in every doc; with df_cap=3 it is dropped, so the pair
        # (1, 10) survives only through its distinctive shingles
        left = _ds(["hot aa bb", "hot cc dd", "hot ee ff"], [1, 2, 3])
        right = _ds(["hot aa bb", "hot gg hh"], [10, 20])
        got = _pairs(
            jaccard_cross_join(
                left, right, ngram_size=1, threshold=0.5,
                left_id="doc_id", right_id="doc_id", df_cap=3,
            )
        )
        # without 'hot', co(1,10) = 2, sizes 3/3 -> j = 2/4 = 0.5
        assert got.left_id.tolist() == [1] and got.right_id.tolist() == [10]


class TestRepetition:
    def test_hand_computed(self):
        ds = _ds(["a a a b", "x y", ""], [0, 1, 2], blocks=1)
        df = (
            with_repetition(ds, ngram=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 0: tokens=4, distinct=2, bigrams=3 ('a a' x2, 'a b') -> top=2
        assert df.n_tokens_rep.tolist() == [4, 2, 0]
        assert df.n_distinct_tokens.tolist() == [2, 2, 0]
        assert df.n_ngrams.tolist() == [3, 1, 0]
        assert df.top_ngram_count.tolist() == [2, 1, 0]
        assert df.dup_token_ratio.tolist() == [0.5, 0.0, 0.0]
        assert np.isclose(df.top_ngram_frac[0], 2 / 3)

    def test_matches_duckdb(self):
        rng = np.random.default_rng(5)
        vocab = ["aa", "bb", "cc", "dd"]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(0, 15))) for _ in range(200)
        ]
        tbl = pa.table(
            {"doc_id": pa.array(range(200), pa.int64()), "text": texts}
        )
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = (
            con.execute(repetition_sql(2)).fetchdf().sort_values("doc_id")
            .reset_index(drop=True)
        )
        cols = ["doc_id", "n_tokens_rep", "n_distinct_tokens", "n_ngrams",
                "top_ngram_count"]
        got = (
            with_repetition(ray.data.from_arrow(tbl).repartition(4), ngram=2)
            .to_pandas()[cols]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(exp[cols])


class TestFilterByQuantile:
    def test_matches_duckdb(self):
        rng = np.random.default_rng(1)
        v = rng.integers(0, 1000, 3000)
        tbl = pa.table({"id": pa.array(range(3000), pa.int64()),
                        "v": pa.array(v, pa.int64())})
        got = (
            filter_by_quantile(ray.data.from_arrow(tbl).repartition(5), "v", 0.9)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = (
            con.execute(
                "SELECT id, v FROM t WHERE v >= "
                "(SELECT quantile_disc(v, 0.9) FROM t) ORDER BY id"
            )
            .fetchdf()
            .reset_index(drop=True)
        )
        assert got.equals(exp)

    def test_lt_complement(self):
        tbl = pa.table({"id": pa.array(range(100), pa.int64()),
                        "v": pa.array(range(100), pa.int64())})
        ds = ray.data.from_arrow(tbl).repartition(3)
        hi = filter_by_quantile(ds, "v", 0.5, keep="ge").count()
        lo = filter_by_quantile(ds, "v", 0.5, keep="lt").count()
        assert hi + lo == 100


class TestTopFrequentTokens:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.textops import top_frequent_tokens

        rng = np.random.default_rng(2)
        vocab = [f"t{i:02d}" for i in range(40)]
        # zipf-ish frequencies so the top order is non-trivial, plus ties
        p = 1.0 / np.arange(1, 41)
        p /= p.sum()
        texts = [
            " ".join(rng.choice(vocab, rng.integers(1, 30), p=p))
            for _ in range(300)
        ]
        tbl = pa.table({"text": texts})
        got = top_frequent_tokens(
            ray.data.from_arrow(tbl).repartition(5), n=15, num_partitions=6
        ).to_pandas()
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = con.execute(
            "WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9_]+')) AS token FROM documents) "
            "SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY token "
            "ORDER BY cnt DESC, token ASC LIMIT 15"
        ).fetchdf()
        assert got.token.tolist() == exp.token.tolist()
        assert got.cnt.tolist() == exp.cnt.tolist()

    def test_boundary_tie_and_empty(self):
        from text_dedup_ray.pipelines.textops import top_frequent_tokens

        tbl = pa.table({"text": ["b b a a c", ""]})
        got = top_frequent_tokens(
            ray.data.from_arrow(tbl).repartition(2), n=2, num_partitions=3
        ).to_pandas()
        assert got.token.tolist() == ["a", "b"]  # tie broken by token asc
        empty = top_frequent_tokens(
            ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())})),
            n=5,
        )
        assert empty.num_rows == 0


class TestExactBinaryDedup:
    def test_bytes_column_dedup(self):
        from text_dedup_ray.pipelines.exact import exact_dedup

        blobs = [b"\x00\x01\x02", b"\xff\xfe", b"\x00\x01\x02", b"\x00"]
        tbl = pa.table(
            {"id": pa.array([3, 1, 0, 2], pa.int64()),
             "payload": pa.array(blobs, pa.binary())}
        )
        out = (
            exact_dedup(
                ray.data.from_arrow(tbl).repartition(2),
                text_column="payload", id_column="id",
            )
            .to_pandas()
            .sort_values("id")
        )
        # duplicate blob keeps min id (0), so 3 drops
        assert out.id.tolist() == [0, 1, 2]
