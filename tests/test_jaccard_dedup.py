"""Exact n-gram Jaccard dedup tests (brute-force oracle)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from text_dedup_ray.functions.jaccard import jaccard_similarity
from text_dedup_ray.functions.tokenization import shingle_set
from text_dedup_ray.pipelines.jaccard_dedup import jaccard_pair_table, ngram_jaccard_dedup


class TestJaccardDedup:
    def test_pairs_match_bruteforce(self):
        from text_dedup_ray.data.gen import generate_corpus

        docs, _ = generate_corpus(150, seed=17)
        texts = docs["caption"].to_pylist()
        t = pa.table({"row_id": pa.array(range(150), pa.int64()), "text": texts})
        got = jaccard_pair_table(
            ray.data.from_arrow(t).repartition(3),
            ngram_size=2,
            min_length=0,
            threshold=0.5,
            num_partitions=8,
            df_cap=1_000_000,
        ).to_pandas()
        got_pairs = {
            (int(r.src), int(r.dst)): round(float(r.jaccard), 6) for r in got.itertuples()
        }
        shingles = [shingle_set(x, 2, 0) for x in texts]
        exp = {}
        for i in range(150):
            for j in range(i + 1, 150):
                ja = jaccard_similarity(shingles[i], shingles[j])
                if ja >= 0.5:
                    exp[(j, i)] = round(ja, 6)
        assert got_pairs == exp
        assert exp  # corpus plants near-dups, so this must be non-trivial

    def test_cluster_map(self):
        t = pa.table(
            {
                "row_id": pa.array(range(4), pa.int64()),
                "text": ["a b c d", "a b c d", "a b c e", "x y z w"],
            }
        )
        parents = ngram_jaccard_dedup(
            ray.data.from_arrow(t), ngram_size=1, min_length=0, threshold=0.6,
            num_partitions=4,
        )
        assert parents.get(1) == 0 and parents.get(2) == 0
        assert 3 not in parents or parents[3] == 3

    def test_df_cap_drops_hot_shingles(self):
        # every doc shares token 'common' (df = n > cap): with a tiny cap the
        # hot shingle is dropped and unrelated docs stay separate
        n = 50
        t = pa.table(
            {
                "row_id": pa.array(range(n), pa.int64()),
                "text": [f"common unique{i}a unique{i}b unique{i}c" for i in range(n)],
            }
        )
        parents = ngram_jaccard_dedup(
            ray.data.from_arrow(t), ngram_size=1, min_length=0, threshold=0.2,
            num_partitions=4, df_cap=10,
        )
        assert parents == {}


class TestContainmentPairs:
    def test_snippet_detected_where_jaccard_misses(self):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.jaccard_dedup import (
            jaccard_pair_table,
            ngram_containment_pairs,
        )

        snippet = "the quick brown fox jumps over the lazy dog"
        host = snippet + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(40))
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([snippet, host, "completely different words only"]),
            }
        )
        ds = ray.data.from_arrow(tbl)
        cont = ngram_containment_pairs(
            ds, id_column="doc_id", ngram_size=3, threshold=0.9,
            df_cap=10**9,
        ).to_pandas()
        assert len(cont) == 1
        assert {int(cont.iloc[0]["src"]), int(cont.iloc[0]["dst"])} == {1, 2}
        assert cont.iloc[0]["containment"] == 1.0
        jac = jaccard_pair_table(
            ds, id_column="doc_id", ngram_size=3, threshold=0.9, df_cap=10**9
        ).to_pandas()
        assert len(jac) == 0  # Jaccard misses the snippet at the same bar

    def test_score_validation(self):
        import pyarrow as pa
        import pytest
        import ray.data

        from text_dedup_ray.pipelines.jaccard_dedup import pairs_from_postings

        ds = ray.data.from_arrow(
            pa.table({"sh": [1], "row_id": [1], "size": [1], "part": [0]})
        )
        with pytest.raises(ValueError):
            pairs_from_postings(ds, score="dice")
