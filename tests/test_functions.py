"""Unit tests for the pure kernels (no Ray needed).

Golden values come from the reference's doctests/tests so our math is
bit-compatible (citations inline)."""

from __future__ import annotations

import numpy as np
import pytest

from text_dedup_ray.functions.hashing import sha1_hash
from text_dedup_ray.functions.intervals import (
    clean_up,
    merge_intervals,
    restore,
    restore_and_merge,
)
from text_dedup_ray.functions.jaccard import jaccard_similarity
from text_dedup_ray.functions.minhash import MinHashConfig, MinHasher, optimal_param
from text_dedup_ray.functions.preprocess import news_copy_preprocessing, normalize
from text_dedup_ray.functions.simhash import (
    SimHashConfig,
    SimHasher,
    block_masks,
    compute_majority,
    create_permutations,
    hamming_distance,
)
from text_dedup_ray.functions.textstats import (
    content_md5,
    count_tokens,
    detect_language,
    quality_stats,
    winnowing_fingerprint,
)
from text_dedup_ray.functions.tokenization import ngrams, shingle_set, tokenize
from text_dedup_ray.functions.unionfind import UnionFind, reduce_edges


class TestHashing:
    def test_sha1_golden(self):
        # reference utils/hashfunc.py:80-87 doctest values
        assert sha1_hash(b"hello world", 32) == 896314922
        assert sha1_hash(b"hello world", 64) == 13028719972609469994
        assert sha1_hash(b"hello world", 128) == 310522945683037930239412421226792791594


class TestTokenization:
    def test_tokenize(self):
        assert tokenize("Hello, World!") == ["hello", "world"]
        assert tokenize("") == []
        assert tokenize("...") == []

    def test_ngrams_edge_cases(self):
        # reference utils/tokenization.py:5-33 semantics
        assert list(ngrams(["a", "b", "c"], 2, min_length=5)) == []
        assert list(ngrams(["a", "b", "c"], 5, min_length=2)) == [("a", "b", "c")]
        assert list(ngrams(["a", "b", "c"], 2, min_length=0)) == [("a", "b"), ("b", "c")]
        assert list(ngrams(["a", "b"], 0, min_length=0)) == []
        with pytest.raises(ValueError):
            ngrams(["a"], -1, 0)

    def test_shingles(self):
        s = shingle_set("The quick brown fox jumps", 2, min_length=2)
        assert b"the quick" in s and b"jumps" not in s
        assert shingle_set("hi there", 2, min_length=5) == set()


class TestMinHash:
    def test_optimal_param_invariants(self):
        b, r = optimal_param(0.5, 200)
        assert b * r <= 200 and b >= 1 and r >= 1
        assert optimal_param(0.5, 200) == optimal_param(0.5, 200)
        b2, r2 = optimal_param(0.9, 200)
        assert r2 > r  # higher threshold -> more rows per band

    def test_signature_parity_with_straightline(self):
        """Vectorized kernel == straight per-doc re-derivation of the
        reference math (config/algorithms/minhash.py:212-227)."""
        cfg = MinHashConfig(num_perm=32, ngram_size=2, min_length=2, bands=8, rows=4, hash_func="sha1")
        mh = MinHasher(cfg)
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "",
            "short text",
            "the quick brown fox jumps over the lazy cat",
        ]
        sigs = mh.signatures(texts)
        a, b = cfg.permutations()
        prime = np.uint64((1 << 61) - 1)
        max_hash = np.uint64((1 << 32) - 1)
        hf = cfg.base_hash()
        for i, text in enumerate(texts):
            tokens = shingle_set(text, 2, 2)
            hv = np.array([hf(t) for t in tokens], dtype=np.uint64).reshape(len(tokens), 1)
            with np.errstate(over="ignore"):
                phv = (hv * a + b) % prime & max_hash
            masks = np.full(32, max_hash, dtype=np.uint64)
            expected = np.vstack([phv, masks[None, :]]).min(axis=0)
            np.testing.assert_array_equal(sigs[i], expected)

    def test_band_bytes_byteswap(self):
        cfg = MinHashConfig(num_perm=8, bands=2, rows=4, hash_func="sha1", min_length=0, ngram_size=1)
        mh = MinHasher(cfg)
        sig = np.arange(8, dtype=np.uint64)
        bands = mh.band_bytes(sig[None, :])[0]
        assert bands[0] == sig[:4].byteswap().tobytes()
        assert len(bands) == 2

    def test_identical_docs_same_signature(self):
        cfg = MinHashConfig(num_perm=64, bands=16, rows=4, hash_func="sha1")
        mh = MinHasher(cfg)
        sigs = mh.signatures(["a document with enough tokens to pass the filter"] * 2)
        np.testing.assert_array_equal(sigs[0], sigs[1])


class TestSimHash:
    def test_compute_majority_golden(self):
        # reference config/algorithms/simhash.py:240-245 doctest
        res = compute_majority([13352372148217134600, 5020219685658847592], 64)
        assert res == 74633958390507528

    def test_block_masks(self):
        assert block_masks(64, 4) == [(0, 16), (16, 32), (32, 48), (48, 64)]
        spans = block_masks(64, 13)  # twelve 5-wide + one 4-wide
        assert len(spans) == 13 and spans[-1] == (60, 64)
        assert sum(e - s for s, e in spans) == 64

    def test_permutation_count_and_roundtrip(self):
        # P(b, b-k) permutations: 4/3 -> 4, 8/7 -> 8, 13/12 -> 13 (simhash.py:452)
        assert len(create_permutations(64, 3, 4)) == 4
        assert len(create_permutations(64, 7, 8)) == 8
        assert len(create_permutations(64, 12, 13)) == 13
        rng = np.random.RandomState(0)
        for perm in create_permutations(64, 3, 4):
            for _ in range(5):
                x = int(rng.randint(0, 2**63 - 1))
                assert perm.reverse(perm.permute(x)) == x

    def test_permutation_against_bitarray_semantics(self):
        """Prefix of the permuted signature == the chosen fixed blocks."""
        perms = create_permutations(64, 3, 4)
        # first permutation fixes block 0 -> permuted == identity on prefix
        x = 0xDEADBEEFCAFEBABE
        p0 = perms[0]
        assert p0.search_mask == 0xFFFF << 48
        assert p0.key(x) == x & (0xFFFF << 48)

    def test_hamming(self):
        assert hamming_distance(0b1010, 0b1010) == 0
        assert hamming_distance(0b1010, 0b0010) == 1

    def test_empty_doc_zero_sig(self):
        sh = SimHasher(SimHashConfig(hash_func="sha1"))
        assert sh.signature("") == 0
        assert sh.signature("short") == 0  # < min_length tokens

    def test_near_docs_low_hamming(self):
        sh = SimHasher(SimHashConfig(hash_func="sha1", ngram_size=1, min_length=0))
        a = sh.signature("the quick brown fox jumps over the lazy dog today")
        b = sh.signature("the quick brown fox jumps over the lazy cat today")
        c = sh.signature("completely different words appear within this unrelated sentence here")
        assert hamming_distance(a, b) < hamming_distance(a, c)

    def test_config_validation(self):
        with pytest.raises(ValueError):
            SimHashConfig(bit_diff=4, num_bucket=4)


class TestUnionFind:
    def test_min_root(self):
        uf = UnionFind()
        uf.union(5, 3)
        uf.union(3, 9)
        assert uf.find(5) == 3 and uf.find(9) == 3
        uf.union(1, 9)
        assert uf.find(5) == 1

    def test_chain(self):
        uf = UnionFind()
        for i in range(99):
            uf.union(i, i + 1)
        assert all(uf.find(i) == 0 for i in range(100))

    def test_non_trivial(self):
        uf = UnionFind()
        uf.union(2, 7)
        uf.find(11)
        assert uf.non_trivial_clusters() == {7: 2}

    def test_reduce_edges(self):
        src = np.array([1, 2, 10, 11], dtype=np.int64)
        dst = np.array([2, 3, 11, 12], dtype=np.int64)
        s, d = reduce_edges(src, dst)
        got = dict(zip(s.tolist(), d.tolist()))
        assert got == {2: 1, 3: 1, 11: 10, 12: 10}


class TestIntervals:
    def test_merge_overlapping(self):
        # reference suffix_array.py doctests
        ivs = [(i, i + 10) for i in range(7)] + [(7, 21)]
        assert merge_intervals(ivs, "overlapping") == [(0, 21)]
        assert merge_intervals([(0, 2), (2, 4), (4, 5)], "overlapping") == [(0, 5)]

    def test_merge_longest(self):
        ivs = [(i, i + 10) for i in range(7)] + [(7, 21)]
        assert merge_intervals(ivs, "longest") == ivs
        assert merge_intervals([(0, 4), (2, 4), (4, 5)], "longest") == [(0, 4), (4, 5)]
        assert merge_intervals([(0, 10)] * 5) == [(0, 10)]

    def test_restore(self):
        got = list(restore([(0, 10), (10, 20)], [(0, 5), (5, 10), (5, 15), (5, 19)]))
        assert got == [(0, (0, 5)), (0, (5, 10)), (1, (0, 5)), (1, (0, 9))]

    def test_restore_and_merge(self):
        res, size = restore_and_merge(
            [(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)], 5, "longest"
        )
        assert res == [[(0, 5), (5, 10)], [(2, 9)]] and size == 17
        res, size = restore_and_merge(
            [(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)], 5, "overlapping"
        )
        assert res == [[(0, 10)], [(2, 9)]] and size == 17

    def test_clean_up(self):
        assert clean_up("This is a test.", [(0, 4), (5, 7)]) == "  a test."


class TestJaccard:
    def test_basic(self):
        assert jaccard_similarity({1, 2}, {2, 3}) == pytest.approx(1 / 3)
        assert jaccard_similarity(set(), set()) == 1.0
        assert jaccard_similarity({1}, set()) == 0.0


class TestPreprocess:
    def test_normalize(self):
        # reference utils/preprocess.py doctests
        assert normalize("Hello, world!") == "hello world"
        assert normalize("Hello, 123!\n\t\b") == "hello 000"

    def test_news_copy(self):
        assert news_copy_preprocessing('a-\nb "c" d\ne') == "ab c d e"


class TestTextStats:
    def test_count_tokens(self):
        assert count_tokens("Hello, world! 123") == 3
        assert count_tokens("") == 0

    def test_quality(self):
        n_chars, n_tokens, alpha, digit = quality_stats("abc 12")
        assert n_chars == 6 and n_tokens == 2
        assert alpha == pytest.approx(3 / 6) and digit == pytest.approx(2 / 6)

    def test_lang(self):
        lang, score = detect_language("the cat sat on the mat and it was happy")
        assert lang == "en" and score > 0.2
        assert detect_language("")[0] == "und"

    def test_md5(self):
        import hashlib

        assert content_md5("abc") == hashlib.md5(b"abc").hexdigest()

    def test_winnowing_deterministic(self):
        a = winnowing_fingerprint("some document text here that is long enough")
        b = winnowing_fingerprint("some document text here that is long enough")
        assert a == b
        assert winnowing_fingerprint("xy") == winnowing_fingerprint("xy")
