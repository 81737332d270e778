"""Property-based checks (hypothesis) for the corpus-stats / split kernels —
invariants that hold for ANY input, verified against brute-force Python
references:

- shingle_redundancy: per-group totals/distincts equal a Counter-based
  reference over the same tokenizer, for any doc/group shapes;
- content_checksums: equals the reference wrap-sum; invariant under row
  permutation; changes when any text changes;
- top_frequent_ngrams: equals the reference (count desc, gram asc) top-k;
- leakage_safe_split: labels partition the fractions' names and identical
  texts NEVER straddle splits.

Each property runs a bounded number of examples (Ray round-trips are
expensive); the value is adversarial shapes — empty strings, unicode,
single-token docs, all-identical corpora — not volume.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from text_dedup_ray.pipelines.corpus import (
    content_checksums,
    shingle_redundancy,
    top_frequent_ngrams,
)
from text_dedup_ray.pipelines.sample import leakage_safe_split

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_TOK = re.compile(r"[a-z0-9_]+")

texts_strategy = st.lists(
    st.text(alphabet=st.sampled_from(list("ab c1 _é!")), max_size=30),
    min_size=0,
    max_size=10,
)


def _tbl(texts, groups=None):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(
                groups if groups is not None else ["g0"] * n, pa.string()
            ),
        }
    )


def _ref_grams(text: str, n: int) -> list[str]:
    toks = _TOK.findall((text or "").lower())
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@given(texts=texts_strategy, gi=st.lists(st.integers(0, 2), min_size=0, max_size=10))
@settings(**_SETTINGS)
def test_shingle_redundancy_matches_bruteforce(texts, gi):
    groups = [f"g{gi[i] if i < len(gi) else 0}" for i in range(len(texts))]
    t = _tbl(texts, groups)
    got = shingle_redundancy(
        ray.data.from_arrow(t), ngram=2, num_partitions=3
    ).to_pandas()
    tot: Counter = Counter()
    dis: dict[str, set] = {}
    for txt, g in zip(texts, groups):
        grams = _ref_grams(txt, 2)
        tot[g] += len(grams)
        dis.setdefault(g, set()).update(grams)
    want = sorted(g for g in tot if tot[g] > 0)
    assert got["source"].tolist() == want
    for _, row in got.iterrows():
        g = row["source"]
        assert row["n_shingles"] == tot[g]
        assert row["n_distinct_shingles"] == len(dis[g])


@given(texts=texts_strategy)
@settings(**_SETTINGS)
def test_content_checksums_bruteforce_and_permutation(texts):
    t = _tbl(texts)
    got = content_checksums(ray.data.from_arrow(t)).to_pandas()
    if not texts:
        assert got.empty
        return
    ref = np.uint64(0)
    for txt in texts:
        ref = np.uint64(
            ref + np.uint64(int(hashlib.md5((txt or "").encode()).hexdigest()[:16], 16))
        )
    assert int(got["checksum64"][0]) == int(ref)
    assert int(got["n_docs"][0]) == len(texts)
    perm = _tbl(list(reversed(texts)))
    again = content_checksums(ray.data.from_arrow(perm)).to_pandas()
    assert int(again["checksum64"][0]) == int(ref)


@given(texts=texts_strategy, k=st.integers(1, 5))
@settings(**_SETTINGS)
def test_top_ngrams_matches_bruteforce(texts, k):
    t = _tbl(texts)
    got = top_frequent_ngrams(
        ray.data.from_arrow(t), ngram=2, n=k, num_partitions=3
    )
    c: Counter = Counter()
    for txt in texts:
        c.update(_ref_grams(txt, 2))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert list(zip(got["gram"].to_pylist(), got["cnt"].to_pylist())) == want


@given(texts=texts_strategy)
@settings(**_SETTINGS)
def test_leakage_split_never_straddles(texts):
    t = _tbl(texts)
    got = leakage_safe_split(
        ray.data.from_arrow(t), {"train": 0.7, "val": 0.3}
    ).to_pandas()
    if not texts:
        assert len(got) == 0
        return
    assert set(got["split"]) <= {"train", "val"}
    by_text: dict[str, set] = {}
    for txt, s in zip(got["text"], got["split"]):
        by_text.setdefault(txt, set()).add(s)
    assert all(len(v) == 1 for v in by_text.values())
