"""pipelines/decontaminate.substring_decontaminate: planted shared-span
cuts, full containment, no-op cases, island merging."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.decontaminate import substring_decontaminate

L = 32
SECRET = "the quick brown fox jumps over the lazy dog again and again ok"  # 63 bytes
assert len(SECRET) >= L


def _ds(rows, col="text"):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(rows))), col: rows})
    )


def test_planted_span_is_cut_and_contained_doc_drops():
    bench = _ds([f"prefix junk {SECRET} suffix junk"])
    head, tail = "A" * 40, "B" * 40
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    head + SECRET + tail,  # span cut, flanks survive
                    SECRET,  # fully covered -> dropped
                    "totally unrelated text with no overlap at all " * 3,
                ],
            }
        )
    )
    out = (
        substring_decontaminate(corpus, bench, length_threshold=L)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [0, 2]
    cleaned = out.loc[out["doc_id"] == 0, "text"].iloc[0]
    assert SECRET not in cleaned
    # the cut is span-level: both flanks survive (coverage may eat at most
    # L-1 bytes beyond the span on the left, by the window semantics)
    assert cleaned.endswith(tail) and cleaned.startswith("A")
    untouched = out.loc[out["doc_id"] == 2, "text"].iloc[0]
    assert untouched == "totally unrelated text with no overlap at all " * 3


def test_two_separate_spans_cut_but_gap_between_them_survives():
    s2 = "zebra xylophone quartz jackdaws love my big sphinx of black quartz!!"
    assert len(s2) >= L
    bench = _ds([SECRET, s2])
    gap = "g" * (L // 2)  # clean text between the two planted spans
    corpus = _ds(["C" * 50 + SECRET + gap + s2 + "D" * 50])
    out = substring_decontaminate(corpus, bench, length_threshold=L).to_pandas()
    txt = out["text"].iloc[0]
    # both spans cut as separate runs (their hit starts are L+len(gap)
    # apart > L, so the islands do NOT merge); the clean gap survives
    assert SECRET not in txt and s2 not in txt
    assert gap in txt
    assert txt.startswith("C") and txt.endswith("D" * 50)


def test_empty_benchmark_is_noop():
    corpus = _ds(["some training text " * 10])
    bench = _ds([], col="text")
    out = substring_decontaminate(corpus, bench, length_threshold=L).to_pandas()
    assert out["text"].iloc[0] == "some training text " * 10


def test_short_docs_pass_through():
    bench = _ds([SECRET])
    corpus = _ds(["short", ""])  # shorter than L -> no windows; empty drops
    out = substring_decontaminate(corpus, bench, length_threshold=L).to_pandas()
    assert out["text"].tolist() == ["short"]
