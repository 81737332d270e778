"""Tiered exact-substring dedup: increment output for the NEW rows must
equal ``suffix_array_dedup_global(old ∪ new)`` restricted to new row ids —
cross-batch shared runs, new-new shared runs, self-repeats, and untouched
uniques all cut identically, while old docs stay immutable."""

from __future__ import annotations

import string

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.incremental_suffix import (
    suffix_bootstrap,
    suffix_increment,
)
from text_dedup_ray.pipelines.suffix_array import suffix_array_dedup_global

L = 80  # length_threshold


def _rand_text(rng, n):
    return "".join(rng.choice(list(string.ascii_lowercase + " "), size=n))


def _corpus():
    rng = np.random.RandomState(13)
    old_texts = [_rand_text(rng, 300) for _ in range(10)]
    passage_old = old_texts[2][50:170]  # 120 bytes of old doc 2
    boiler = _rand_text(rng, 150)
    old_texts[5] = old_texts[5][:100] + boiler + old_texts[5][100:]
    old_texts[8] = old_texts[8][:40] + boiler + old_texts[8][40:]

    new_texts = [
        _rand_text(rng, 100) + passage_old + _rand_text(rng, 80),  # cross-batch
        _rand_text(rng, 250),                                      # unique
        None,                                                      # self-repeat (below)
        None,                                                      # new-new pair (below)
        None,
        _rand_text(rng, 60) + boiler + _rand_text(rng, 60),        # old boilerplate
    ]
    rep = _rand_text(rng, 110)
    new_texts[2] = _rand_text(rng, 70) + rep + _rand_text(rng, 50) + rep
    shared_new = _rand_text(rng, 130)
    new_texts[3] = _rand_text(rng, 90) + shared_new
    new_texts[4] = shared_new + _rand_text(rng, 90)
    old_ids = list(range(10))
    new_ids = [100 + i for i in range(len(new_texts))]
    return old_ids, old_texts, new_ids, new_texts


def _tbl(ids, texts):
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def _full_batch_new_rows(old_ids, old_texts, new_ids, new_texts) -> dict[int, str]:
    both = pa.concat_tables([_tbl(old_ids, old_texts), _tbl(new_ids, new_texts)])
    out = suffix_array_dedup_global(
        ray.data.from_arrow(both), id_column="doc_id", length_threshold=L
    ).to_pandas()
    cut = max(old_ids)
    return {
        int(r.doc_id): r.text for r in out.itertuples() if int(r.doc_id) > cut
    }


def _increment_rows(ds) -> dict[int, str]:
    df = ds.to_pandas()
    return {int(r.row_id): r.text for r in df.itertuples()}


class TestSuffixIncremental:
    def test_single_increment_equals_full_batch(self, tmp_path):
        old_ids, old_texts, new_ids, new_texts = _corpus()
        expect = _full_batch_new_rows(old_ids, old_texts, new_ids, new_texts)
        state = str(tmp_path / "state")
        deduped, v, _ = suffix_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old_texts)), state,
            id_column="doc_id", length_threshold=L, num_partitions=8,
        )
        assert v == 1
        inc, v2, _ = suffix_increment(
            ray.data.from_arrow(_tbl(new_ids, new_texts)), state,
            ray.data.from_arrow(_tbl(old_ids, old_texts)), id_column="doc_id",
        )
        got = _increment_rows(inc)
        assert got == expect
        # fixture sanity: the cross-batch passage and old boilerplate were cut
        assert len(got[100]) < len(new_texts[0])
        assert len(got[105]) < len(new_texts[5])
        assert got[101] == new_texts[1]  # unique untouched
        assert len(got[102]) < len(new_texts[2])  # self-repeat cut
        assert len(got[103]) < len(new_texts[3])  # new-new cut
        assert v2 == 2

    def test_chained_increments(self, tmp_path):
        old_ids, old_texts, new_ids, new_texts = _corpus()
        expect = _full_batch_new_rows(old_ids, old_texts, new_ids, new_texts)
        state = str(tmp_path / "state")
        suffix_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old_texts)), state,
            id_column="doc_id", length_threshold=L, num_partitions=8,
        )
        inc1, _, _ = suffix_increment(
            ray.data.from_arrow(_tbl(new_ids[:3], new_texts[:3])), state,
            ray.data.from_arrow(_tbl(old_ids, old_texts)), id_column="doc_id",
        )
        old2 = pa.concat_tables(
            [_tbl(old_ids, old_texts), _tbl(new_ids[:3], new_texts[:3])]
        )
        inc2, v, _ = suffix_increment(
            ray.data.from_arrow(_tbl(new_ids[3:], new_texts[3:])), state,
            ray.data.from_arrow(old2), id_column="doc_id",
        )
        got = {**_increment_rows(inc1), **_increment_rows(inc2)}
        # chained == full batch: docs 100-102 see only old partners; 103/104
        # share their run within increment 2; 105 shares boilerplate with old
        assert got == expect
        assert v == 3

    def test_forced_distributed(self, tmp_path):
        old_ids, old_texts, new_ids, new_texts = _corpus()
        expect = _full_batch_new_rows(old_ids, old_texts, new_ids, new_texts)
        state = str(tmp_path / "state")
        suffix_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old_texts)), state,
            id_column="doc_id", length_threshold=L, num_partitions=8,
            driver_threshold=0,
        )
        inc, _, _ = suffix_increment(
            ray.data.from_arrow(_tbl(new_ids, new_texts)), state,
            ray.data.from_arrow(_tbl(old_ids, old_texts)), id_column="doc_id",
            driver_threshold=0,
        )
        assert _increment_rows(inc) == expect

    def test_id_validation(self, tmp_path):
        old_ids, old_texts, _, _ = _corpus()
        state = str(tmp_path / "state")
        suffix_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old_texts)), state,
            id_column="doc_id", length_threshold=L,
        )
        with pytest.raises(ValueError, match="max_row_id"):
            suffix_increment(
                ray.data.from_arrow(_tbl(old_ids[:2], old_texts[:2])), state,
                ray.data.from_arrow(_tbl(old_ids, old_texts)), id_column="doc_id",
            )


class TestSuffixIncrementSkew:
    def test_hot_anchor_capped_but_boilerplate_still_cut(self, tmp_path):
        """Boilerplate shared by many old docs makes its anchors hot; with
        max_bucket far below the membership the edge emission keeps only the
        min-id old members — which ALL contain the run — so the new doc still
        groups with a partner and the boilerplate is still cut from it."""
        rng = np.random.RandomState(23)
        boiler = _rand_text(rng, 150)
        old_ids = list(range(30))
        old_texts = [
            _rand_text(rng, 60) + boiler + _rand_text(rng, 60) for _ in old_ids
        ]
        new_ids = [500]
        new_texts = [_rand_text(rng, 70) + boiler + _rand_text(rng, 70)]
        state = str(tmp_path / "state")
        suffix_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old_texts)), state,
            id_column="doc_id", length_threshold=L, num_partitions=4,
        )
        inc, _, _ = suffix_increment(
            ray.data.from_arrow(_tbl(new_ids, new_texts)), state,
            ray.data.from_arrow(_tbl(old_ids, old_texts)), id_column="doc_id",
            max_bucket=4,
        )
        got = _increment_rows(inc)
        assert 500 in got
        assert boiler not in got[500]      # boilerplate cut despite the cap
        assert len(got[500]) < len(new_texts[0])
