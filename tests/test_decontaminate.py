"""Benchmark decontamination: broadcast + co-partition paths, both modes,
DuckDB parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.oracles import decontaminate_sql
from text_dedup_ray.pipelines.decontaminate import decontaminate


def _ds(texts, ids=None, blocks=3):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ).repartition(blocks)


def _stats(res):
    df = res.annotated.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df


class TestBroadcastPath:
    def test_exact_copy_flagged_disjoint_clean(self):
        bench = _ds(["the quick brown fox jumps over the lazy dog"], blocks=1)
        corpus = _ds(
            [
                "the quick brown fox jumps over the lazy dog",  # copy
                "completely unrelated words about gardening tools here",
            ]
        )
        res = decontaminate(corpus, bench, ngram_size=3, min_length=0, threshold=0.8)
        assert res.metrics["path"] == "broadcast"
        df = _stats(res)
        assert df.contaminated.tolist() == [True, False]
        assert df.n_hit[0] == df.n_grams[0] > 0
        assert df.n_hit[1] == 0
        assert res.clean.count() == 1 and res.contaminated.count() == 1

    def test_fraction_threshold_boundary(self):
        # 6 unigrams, 3 shared -> fraction exactly 0.5
        bench = _ds(["alpha beta gamma"], blocks=1)
        corpus = _ds(["alpha beta gamma delta epsilon zeta"])
        lo = decontaminate(corpus, bench, ngram_size=1, min_length=0, threshold=0.5)
        hi = decontaminate(corpus, bench, ngram_size=1, min_length=0, threshold=0.51)
        assert _stats(lo).contaminated.tolist() == [True]
        assert _stats(hi).contaminated.tolist() == [False]

    def test_any_mode_single_shared_ngram(self):
        bench = _ds(["one two three four five six seven eight"], blocks=1)
        # shares exactly the 3-gram "six seven eight"
        corpus = _ds(
            [
                "zzz yyy xxx six seven eight www vvv uuu",
                "nothing in common at all whatsoever friends",
            ]
        )
        frac = decontaminate(corpus, bench, ngram_size=3, min_length=0, threshold=0.5)
        any_ = decontaminate(corpus, bench, ngram_size=3, min_length=0, mode="any")
        assert _stats(frac).contaminated.tolist() == [False, False]
        assert _stats(any_).contaminated.tolist() == [True, False]

    def test_zero_gram_docs_survive(self):
        bench = _ds(["alpha beta gamma delta epsilon"], blocks=1)
        corpus = _ds(["alpha beta", "alpha beta gamma delta epsilon and more"])
        res = decontaminate(corpus, bench, ngram_size=2, min_length=5, threshold=0.3)
        df = _stats(res)
        assert len(df) == 2
        assert df.n_grams[0] == 0 and not df.contaminated[0]
        assert df.n_grams[1] > 0

    def test_empty_benchmark_all_clean(self):
        bench = _ds([], blocks=1)
        corpus = _ds(["some words here now", "other words there then"])
        res = decontaminate(corpus, bench, ngram_size=2, min_length=0, threshold=0.1)
        df = _stats(res)
        assert (~df.contaminated).all() and (df.n_hit == 0).all()


class TestShufflePathParity:
    def _rand_corpora(self, seed=7, n_corpus=60, n_bench=12):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(30)]
        mk = lambda: " ".join(rng.choice(vocab, rng.integers(3, 20)))
        bench_texts = [mk() for _ in range(n_bench)]
        corpus_texts = [mk() for _ in range(n_corpus)]
        corpus_texts[5] = bench_texts[0]  # plant a copy
        return corpus_texts, bench_texts

    def test_shuffle_equals_broadcast(self):
        corpus_texts, bench_texts = self._rand_corpora()
        kw = dict(ngram_size=2, min_length=0, threshold=0.5, id_column="doc_id")
        b = decontaminate(_ds(corpus_texts), _ds(bench_texts), **kw)
        s = decontaminate(
            _ds(corpus_texts), _ds(bench_texts), broadcast_limit=0,
            num_partitions=7, **kw,
        )
        assert b.metrics["path"] == "broadcast" and s.metrics["path"] == "shuffle"
        cols = ["doc_id", "n_grams", "n_hit", "contaminated"]
        assert _stats(b)[cols].equals(_stats(s)[cols])

    def test_shuffle_partition_count_invariance(self):
        corpus_texts, bench_texts = self._rand_corpora(seed=11)
        kw = dict(
            ngram_size=1, min_length=0, threshold=0.4, id_column="doc_id",
            broadcast_limit=0,
        )
        a = decontaminate(_ds(corpus_texts), _ds(bench_texts), num_partitions=1, **kw)
        c = decontaminate(_ds(corpus_texts), _ds(bench_texts), num_partitions=13, **kw)
        cols = ["doc_id", "n_grams", "n_hit", "contaminated"]
        assert _stats(a)[cols].equals(_stats(c)[cols])

    def test_shuffle_zero_gram_sentinel(self):
        bench = _ds(["alpha beta gamma delta epsilon"], blocks=1)
        corpus = _ds(["alpha beta", "alpha beta gamma delta epsilon zeta"])
        res = decontaminate(
            corpus, bench, ngram_size=2, min_length=5, threshold=0.3,
            id_column="doc_id", broadcast_limit=0, num_partitions=4,
        )
        df = _stats(res)
        assert len(df) == 2 and df.n_grams[0] == 0 and not df.contaminated[0]
        assert df.contaminated[1]


class TestDuckDBParity:
    def test_matches_oracle(self):
        rng = np.random.default_rng(3)
        vocab = [f"tok{i}" for i in range(25)]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(1, 15))) for _ in range(97 * 3)
        ]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = (
            con.execute(decontaminate_sql(2, 0, 0.5, mod=97))
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        corpus = ds.map_batches(
            lambda t: t.filter(
                np.asarray(t["doc_id"].to_numpy(zero_copy_only=False) % 97 != 0)
            ),
            batch_format="pyarrow",
        )
        bench = ds.map_batches(
            lambda t: t.filter(
                np.asarray(t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0)
            ),
            batch_format="pyarrow",
        )
        got = (
            decontaminate(corpus, bench, ngram_size=2, min_length=0, threshold=0.5)
            .annotated.to_pandas()[["doc_id", "n_grams", "n_hit", "contaminated"]]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(exp[["doc_id", "n_grams", "n_hit", "contaminated"]])
