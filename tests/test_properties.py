"""Property-based checks (hypothesis) for the round-4 curation kernels —
invariants that hold for ANY input, not just the crafted fixtures:

- chunk_text: full character coverage, overlap consistency, exact chunk
  counts, lossless reconstruction;
- dedup_lines_within: idempotence, no-new-lines, count conservation;
- seeded_shuffle: output is a permutation with a contiguous 0..n-1
  position cover regardless of partitioning;
- cap_duplicates: survivor multiset per text == min(k, occurrences).

Ray round-trips are expensive per example, so each property runs on a
bounded number of generated cases (max_examples kept small) — the point
is adversarial input shapes (empty strings, separators at the ends,
unicode, all-identical), not volume.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab \né!")),
        max_size=40,
    ),
    min_size=0,
    max_size=12,
)


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


@settings(**_SETTINGS)
@given(texts=texts_strategy, size=st.integers(2, 9), overlap=st.integers(0, 3))
def test_chunk_text_covers_and_reconstructs(texts, size, overlap):
    from text_dedup_ray.pipelines.textops import chunk_text

    if overlap >= size:
        overlap = size - 1
    step = size - overlap
    out = chunk_text(
        ray.data.from_arrow(_docs_table(texts)), size=size, overlap=overlap
    ).to_pandas()
    by_doc = (
        {int(d): g.sort_values("chunk_no") for d, g in out.groupby("doc_id")}
        if len(out)
        else {}
    )
    for i, t in enumerate(texts):
        g = by_doc.get(i)
        if len(t) == 0:
            assert g is None
            continue
        expected_n = (max(len(t) - overlap, 1) + step - 1) // step
        assert len(g) == expected_n
        # starts are the exact stride grid and every chunk matches a slice
        rebuilt = None
        for _, row in g.iterrows():
            s = int(row["chunk_start"])
            assert s == int(row["chunk_no"]) * step
            assert row["chunk"] == t[s : s + size]
            rebuilt = (
                row["chunk"]
                if rebuilt is None
                else rebuilt + row["chunk"][overlap:]
            )
        assert rebuilt == t  # lossless stitching


@settings(**_SETTINGS)
@given(texts=texts_strategy, min_len=st.integers(0, 3))
def test_dedup_lines_within_idempotent_and_conserving(texts, min_len):
    from text_dedup_ray.pipelines.lines import dedup_lines_within

    import pandas as pd

    def run(tbl):
        out = dedup_lines_within(
            ray.data.from_arrow(tbl), sep="\n", min_line_length=min_len
        ).to_pandas()
        if len(out) == 0:
            return pd.DataFrame({"doc_id": [], "text": [], "n_dropped": []})
        return out.sort_values("doc_id")

    once = run(_docs_table(texts))
    for i, t in enumerate(texts):
        orig = t.split("\n")
        kept = once.iloc[i]["text"].split("\n")
        # conservation: kept + dropped == original line count
        assert len(kept) + int(once.iloc[i]["n_dropped"]) == len(orig)
        # no new lines invented; kept is a subsequence of the original
        it = iter(orig)
        assert all(any(o == k for o in it) for k in kept)
    twice = run(
        pa.table(
            {
                "doc_id": pa.array(range(len(once)), pa.int64()),
                "text": pa.array(list(once["text"]), pa.string()),
            }
        )
    )
    assert list(twice["text"]) == list(once["text"])  # idempotent
    assert (twice["n_dropped"] == 0).all()


@settings(**_SETTINGS)
@given(
    n=st.integers(0, 60),
    seed=st.integers(0, 5),
    parts=st.integers(1, 4),
)
def test_seeded_shuffle_is_a_permutation(n, seed, parts):
    from text_dedup_ray.pipelines.sample import seeded_shuffle

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    )
    if n > 0:
        ds = ds.repartition(parts)
    out = seeded_shuffle(ds, "doc_id", seed=seed, num_partitions=3).to_pandas()
    if n == 0:
        assert len(out) == 0
        return
    assert sorted(out["shuffle_pos"]) == list(range(n))
    assert sorted(out["doc_id"]) == list(range(n))


@settings(**_SETTINGS)
@given(
    texts=st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=20),
    k=st.integers(1, 4),
)
def test_cap_duplicates_survivor_counts(texts, k):
    from collections import Counter

    from text_dedup_ray.pipelines.exact import cap_duplicates

    out = cap_duplicates(
        ray.data.from_arrow(_docs_table(texts)), id_column="doc_id", k=k
    ).to_pandas()
    want = Counter(texts)
    got = Counter(out["text"]) if len(out) else Counter()
    for t, c in want.items():
        assert got[t] == min(k, c)
    # every survivor carries its text's TOTAL count
    for _, row in out.iterrows():
        assert int(row["n_copies"]) == want[row["text"]]
