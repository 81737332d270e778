"""Tests for exact dedup, suffix-array dedup, text ops, ANN, and image ops."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.data.gen import generate_corpus
from text_dedup_ray.functions.suffixarray import (
    adjacent_lcp,
    duplicate_byte_ranges,
    suffix_array,
)
from text_dedup_ray.pipelines.ann import (
    brute_force_topk,
    embedding_cosine_dedup,
    lsh_bucket_topk,
)
from text_dedup_ray.pipelines.exact import exact_cluster_table, exact_dedup
from text_dedup_ray.pipelines.images import (
    ImageDecodeStage,
    ImageResizeStage,
    check_row_invariants,
    image_caption_dedup,
    phash_near_dedup_parents,
)
from text_dedup_ray.pipelines.suffix_array import suffix_array_dedup
from text_dedup_ray.pipelines.textops import (
    with_fingerprints,
    with_language,
    with_quality,
    with_token_counts,
)


class TestSuffixArrayFunctions:
    def test_suffix_array_banana(self):
        data = np.frombuffer(b"banana", dtype=np.uint8)
        sa = suffix_array(data)
        # suffixes sorted: a, ana, anana, banana, na, nana
        assert sa.tolist() == [5, 3, 1, 0, 4, 2]

    def test_lcp(self):
        data = np.frombuffer(b"banana", dtype=np.uint8)
        sa = suffix_array(data)
        lcp = adjacent_lcp(data, sa)
        assert lcp.tolist() == [1, 3, 0, 0, 2]

    def test_duplicate_ranges(self):
        text = b"X" * 5 + b"HELLOWORLDHELLOWORLD" + b"Y" * 5
        data = np.frombuffer(text, dtype=np.uint8)
        ranges = duplicate_byte_ranges(data, 10)
        # 'HELLOWORLD' repeats; both occurrences covered
        covered = set()
        for s, e in ranges:
            covered.update(range(s, e))
        assert set(range(5, 25)) <= covered
        assert not covered & set(range(0, 4))

    def test_no_duplicates(self):
        data = np.frombuffer(bytes(range(200)), dtype=np.uint8)
        assert duplicate_byte_ranges(data, 10) == []

    def test_random_parity_bruteforce(self):
        rng = np.random.RandomState(7)
        data = rng.randint(97, 101, size=300).astype(np.uint8)
        sa = suffix_array(data)
        # brute-force check of suffix order
        suffixes = sorted(range(len(data)), key=lambda i: data[i:].tobytes())
        assert sa.tolist() == suffixes


class TestSuffixArrayPipeline:
    def test_cuts_shared_runs(self):
        shared = "q w e r t y u i o p " * 10  # 200 chars shared
        rows = [
            "aaa unique prefix one " + shared,
            "bbb different prefix " + shared,
            "ccc completely unrelated text with no duplicate runs at all",
        ]
        ds = ray.data.from_arrow(pa.table({"text": rows}))
        out = suffix_array_dedup(ds, length_threshold=100).to_pandas()
        texts = sorted(out["text"].tolist())
        assert len(out) == 3
        assert any("unrelated" in t for t in texts)
        for t in texts:
            assert shared[:150] not in t  # long shared run removed

    def test_drop_empty(self):
        dup = "z x c v b n m " * 20
        ds = ray.data.from_arrow(pa.table({"text": [dup, dup]}))
        out = suffix_array_dedup(ds, length_threshold=50).to_pandas()
        assert len(out) == 0  # both docs fully duplicated -> cut -> empty -> dropped


class TestExactDedup:
    def test_first_occurrence_wins(self):
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": ["a", "b", "a", "c", "b"],
            }
        )
        out = exact_dedup(ray.data.from_arrow(t), id_column="doc_id").to_pandas()
        assert sorted(out["doc_id"].tolist()) == [0, 1, 3]

    def test_cluster_table(self):
        t = pa.table(
            {"doc_id": pa.array([10, 11, 12], pa.int64()), "text": ["x", "y", "x"]}
        )
        out = exact_cluster_table(ray.data.from_arrow(t), id_column="doc_id").to_pandas()
        m = dict(zip(out["row_id"], out["cluster_id"]))
        assert m == {10: 10, 11: 11, 12: 10}


class TestTextOps:
    def _docs(self):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": ["The cat sat on the mat, 42 times!", ""],
                }
            )
        )

    def test_token_counts(self):
        out = with_token_counts(self._docs()).to_pandas().sort_values("doc_id")
        assert out["n_tokens"].tolist() == [8, 0]

    def test_quality(self):
        out = with_quality(self._docs()).to_pandas().sort_values("doc_id")
        assert out["n_chars_q"].tolist()[0] == 33
        assert out["alpha_ratio"].tolist()[1] == 0.0

    def test_language(self):
        out = with_language(self._docs()).to_pandas().sort_values("doc_id")
        assert out["lang_pred"].tolist() == ["en", "und"]

    def test_fingerprints(self):
        out = with_fingerprints(self._docs()).to_pandas().sort_values("doc_id")
        import hashlib

        assert out["content_md5"].tolist()[0] == hashlib.md5(
            "The cat sat on the mat, 42 times!".encode()
        ).hexdigest()


class TestAnn:
    def _embeddings(self, n=200, dim=16, seed=3):
        rng = np.random.RandomState(seed)
        vecs = rng.randn(n, dim).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
        return t, vecs

    def test_brute_force_exact(self):
        t, vecs = self._embeddings()
        q = vecs[:3] + 0.01
        ds = ray.data.from_arrow(t).repartition(4)
        out = brute_force_topk(ds, q, k=5).to_pandas()
        # numpy ground truth
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        scores = qn @ vn.T
        for qi in range(3):
            expect = set(np.argsort(-scores[qi])[:5].tolist())
            got = set(out[out.query_idx == qi]["vec_id"].tolist())
            assert got == expect

    def test_lsh_topk_finds_self(self):
        t, vecs = self._embeddings()
        q = vecs[:5]  # exact members -> must co-bucket with themselves
        ds = ray.data.from_arrow(t).repartition(2)
        out = lsh_bucket_topk(ds, q, k=3).to_pandas()
        for qi in range(5):
            hits = out[out.query_idx == qi]
            assert qi in hits["vec_id"].tolist()

    def test_embedding_dedup(self):
        t, vecs = self._embeddings(n=50)
        # plant near-duplicates: rows 50..54 are copies of 0..4
        dup_vecs = vecs[:5] * 1.0001
        t2 = pa.table(
            {
                "vec_id": pa.array(range(55), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in np.vstack([vecs, dup_vecs])], pa.list_(pa.float32())
                ),
            }
        )
        parents = embedding_cosine_dedup(
            ray.data.from_arrow(t2).repartition(3), threshold=0.999
        )
        for i in range(5):
            assert parents.get(50 + i, 50 + i) == i


class TestImages:
    @pytest.fixture(scope="class")
    def corpus(self):
        docs, truth = generate_corpus(300, seed=7)
        return docs, truth

    def test_decode_stage(self, corpus):
        docs, _ = corpus
        ds = ray.data.from_arrow(docs).limit(50)
        out = ds.map_batches(
            ImageDecodeStage, batch_format="pyarrow", batch_size=16, concurrency=2
        ).to_pandas()
        assert out["decode_ok"].all()
        # png rows decode losslessly -> recomputed phash matches stored
        png = out[out.fmt == "png"]
        assert (png["phash_check"] == png["phash"]).all()

    def test_resize_stage(self, corpus):
        docs, _ = corpus
        ds = ray.data.from_arrow(docs).limit(10)
        out = ds.map_batches(
            ImageResizeStage,
            fn_constructor_args=(8, 8),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        ).to_pandas()
        assert (out["w"] == 8).all() and (out["h"] == 8).all()
        from text_dedup_ray.functions.codecs import decode_image

        pix = decode_image(out["bytes"].iloc[0], out["fmt"].iloc[0])
        assert pix.shape == (8, 8, 3)

    def test_phash_near_dedup(self, corpus):
        docs, truth = corpus
        from text_dedup_ray.pipelines.images import image_ids_to_row_ids

        ds = image_ids_to_row_ids(ray.data.from_arrow(docs)).repartition(3)
        parents = phash_near_dedup_parents(ds, bit_diff=2, num_bucket=4)
        # same-cluster rows share the base image -> phash within 2 bits
        kinds = truth["kind"].to_pylist()
        cl = truth["cluster_id"].to_pylist()
        from collections import defaultdict

        groups = defaultdict(list)
        for i, (k, c) in enumerate(zip(kinds, cl)):
            groups[c].append(i)
        multi = [g for g in groups.values() if len(g) > 1]
        assert multi
        merged = sum(
            1 for g in multi if len({parents.get(m, m) for m in g}) == 1
        )
        assert merged / len(multi) >= 0.95  # lossy re-encode moves phash ≤ a few bits

    def test_flagship_and_invariants(self, corpus):
        docs, truth = corpus
        from text_dedup_ray.functions.minhash import MinHashConfig

        ds = ray.data.from_arrow(docs).repartition(4)
        res = image_caption_dedup(
            ds, cfg=MinHashConfig(num_perm=64, bands=16, rows=4, ngram_size=2, hash_func="sha1")
        )
        survivors = res.deduped.to_pandas()
        stats = check_row_invariants(docs, pa.Table.from_pandas(survivors[docs.column_names]))
        assert stats["checked"] == len(survivors) > 0
        assert stats["worst_psnr"] == float("inf")  # payloads untouched
        # exact caption clusters collapsed
        kinds = truth["kind"].to_pylist()
        cl = truth["cluster_id"].to_pylist()
        from collections import defaultdict

        groups = defaultdict(list)
        for i, (k, c) in enumerate(zip(kinds, cl)):
            if k == "exact":
                groups[c].append(i)
        for g in groups.values():
            roots = {res.parents.get(m, m) for m in g}
            assert len(roots) == 1


class TestVectorizedTextStats:
    def test_native_kernels_match_scalar_reference(self):
        # the Arrow count_substring_regex kernels must agree with the
        # Python reference kernels on edge inputs (unicode, empty,
        # punctuation-only, digits)
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.functions.textstats import count_tokens, quality_stats
        from text_dedup_ray.pipelines.textops import with_quality, with_token_counts

        texts = [
            "", "   ", "Hello, world! 123", "éàü über naïve", "a_b_c",
            "123 456", "!!!", "mixed: Ünïcode and ascii_tok3ns, 42",
        ]
        tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        got_q = (
            with_quality(ray.data.from_arrow(tbl))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got_t = (
            with_token_counts(ray.data.from_arrow(tbl))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, t in enumerate(texts):
            nc, nt, al, dg = quality_stats(t)
            assert got_t.n_tokens[i] == count_tokens(t), t
            assert got_q.n_tokens[i] == nt, t
            assert got_q.n_chars_q[i] == nc, t
            assert abs(got_q.alpha_ratio[i] - al) < 1e-12, t
            assert abs(got_q.digit_ratio[i] - dg) < 1e-12, t


class TestChunkText:
    def test_coverage_overlap_and_edges(self):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.textops import chunk_text

        texts = ["a" * 512, "b" * 513, "c" * 100, "", "d" * 64, "é" * 300]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        )
        out = chunk_text(ds, size=512, overlap=64).to_pandas()
        by_doc = dict(out.groupby("doc_id").size())
        assert by_doc == {0: 1, 1: 2, 2: 1, 4: 1, 5: 1}  # doc 3 (empty): none
        two = out[out.doc_id == 1].sort_values("chunk_no")
        assert list(two.chunk_start) == [0, 448]
        assert len(two.iloc[0]["chunk"]) == 512 and len(two.iloc[1]["chunk"]) == 65
        # reconstruction: stitching chunks re-covers every char
        s = "b" * 513
        assert two.iloc[0]["chunk"] + two.iloc[1]["chunk"][64:] == s
        # unicode char (not byte) windows
        uni = out[out.doc_id == 5].iloc[0]["chunk"]
        assert uni == "é" * 300

    def test_overlap_must_be_smaller(self):
        import pyarrow as pa
        import pytest
        import ray.data

        from text_dedup_ray.pipelines.textops import chunk_text

        ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError):
            chunk_text(ds, size=64, overlap=64)


class TestCapDuplicates:
    def test_keeps_k_smallest_and_stamps_counts(self):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.exact import cap_duplicates

        texts = ["aa", "bb", "aa", "aa", "cc", "bb", "aa"]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        ).repartition(3)
        out = (
            cap_duplicates(ds, id_column="doc_id", k=2, num_partitions=4)
            .to_pandas()
            .sort_values("doc_id")
        )
        # 'aa' x4 -> keep ids 0,2; 'bb' x2 -> keep 1,5; 'cc' -> keep 4
        assert list(out["doc_id"]) == [0, 1, 2, 4, 5]
        got = dict(zip(out["doc_id"], out["n_copies"]))
        assert got == {0: 4, 2: 4, 1: 2, 5: 2, 4: 1}
        # k=1 == exact_dedup survivor set
        one = cap_duplicates(ds, id_column="doc_id", k=1).to_pandas()
        assert sorted(one["doc_id"]) == [0, 1, 4]

    def test_k_validation_and_empty(self):
        import pyarrow as pa
        import pytest
        import ray.data

        from text_dedup_ray.pipelines.exact import cap_duplicates

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        )
        with pytest.raises(ValueError):
            cap_duplicates(ds, id_column="doc_id", k=0)
        assert cap_duplicates(ds, id_column="doc_id", k=2).count() == 0


class TestSelectTokenBudgetByGroup:
    def _ds(self):
        import pyarrow as pa
        import ray.data

        rows = [
            ("en", 0, 50), ("en", 1, 80), ("en", 2, 80), ("en", 3, 30),
            ("fr", 4, 100), ("fr", 5, 100), ("fr", 6, 1),
        ]
        return ray.data.from_arrow(
            pa.table(
                {
                    "lang": pa.array([r[0] for r in rows]),
                    "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                    "tok": pa.array([r[2] for r in rows], pa.int64()),
                }
            )
        ).repartition(3)

    def test_int_budget_per_group(self):
        from text_dedup_ray.pipelines.select import select_token_budget_by_group

        out = (
            select_token_budget_by_group(
                self._ds(), "lang", "doc_id", "tok", "tok", budget=160
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        # en ranked: 80(id1),80(id2),50(id0),30(id3) -> cum 80,160,210,240 -> keep 1,2
        # fr ranked: 100(id4),100(id5),1(id6) -> cum 100,200,201 -> keep 4
        assert list(out["doc_id"]) == [1, 2, 4]
        offs = dict(zip(out["doc_id"], out["sel_offset"]))
        assert offs == {1: 0, 2: 80, 4: 0}

    def test_dict_budget_missing_group_excluded(self):
        from text_dedup_ray.pipelines.select import select_token_budget_by_group

        out = select_token_budget_by_group(
            self._ds(), "lang", "doc_id", "tok", "tok",
            budget={"en": 300, "de": 999},
        ).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2, 3]  # fr absent -> excluded
