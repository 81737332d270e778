"""Cross-cohort corpus overlap — "how much does source A repeat source B?"
— the measurement behind corpus-mixing and dedup-priority decisions: the
EXACT pairwise Jaccard similarity between the distinct shingle sets of every
pair of cohorts (sources, languages, snapshots).

Scale plan (nothing corpus-sized moves or reaches the driver):

1. per block: shingle each doc (reference tokenizer + n-gram edge cases,
   ``functions/tokenization.py``), emit the block-DISTINCT (cohort-bit,
   shingle-hash64) pairs — the only thing that ever leaves a block is
   16 bytes per distinct-(cohort, shingle) of that block;
2. one hash exchange co-locates every copy of a shingle; each partition
   OR-folds the cohort bits per shingle and emits (cohort-bitmask, count)
   — at most 2^|cohorts| tiny integer rows per partition;
3. the driver folds the mask histogram (integers, not rows) into the
   pairwise |A∩B| / |A| / |B| matrix.

Shingle identity is the md5-prefix 64-bit hash ``int.from_bytes(
md5(gram)[:8], 'big')`` — the SAME function the DuckDB oracle applies
(``('0x' || substr(md5(g), 1, 16))::UBIGINT``), so op and oracle agree
exactly (not just up to collisions). Cohort count is capped at 63 (int64
bitmask); raise, don't wrap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenization import ngrams, tokenize
from ..stages.exchange import hash_partition_exchange

MAX_GROUPS = 63


def _distinct_groups(ds: ray.data.Dataset, group_column: str) -> list[str]:
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string())})
        return pa.table({"g": batch[group_column].unique()})

    pool = ds.select_columns([group_column]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    groups = sorted(pool["g"].unique().tolist()) if "g" in pool.columns else []
    if len(groups) > MAX_GROUPS:
        raise ValueError(
            f"source_overlap supports at most {MAX_GROUPS} cohorts, got {len(groups)}"
        )
    return groups


def source_overlap(
    ds: ray.data.Dataset,
    text_column: str = "text",
    group_column: str = "source",
    ngram_size: int = 3,
    min_length: int = 1,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Pairwise exact shingle-set Jaccard between cohorts: one row per
    unordered cohort pair (a < b lexicographically) with the distinct
    shingle counts ``n_a``/``n_b``, the intersection ``n_common``, and
    ``jaccard = n_common / (n_a + n_b - n_common)`` (1.0 when both sets
    are empty). The ratio is the raw int64/int64 double — bit-identical
    to the SQL oracle's, so no rounding is needed anywhere."""
    groups = _distinct_groups(ds, group_column)
    gid = {g: i for i, g in enumerate(groups)}
    gid_ref = ray.put(gid)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"h": pa.array([], pa.int64()), "bit": pa.array([], pa.int64()),
             "part": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        gmap = ray.get(gid_ref) if isinstance(gid_ref, ray.ObjectRef) else gid_ref
        texts = batch[text_column].to_pylist()
        srcs = batch[group_column].to_pylist()
        # dedup (gram, cohort) pairs FIRST, then hash each distinct gram
        # exactly once — captions repeat shingles heavily, so this cuts the
        # md5 count by the block's duplication factor
        seen: set[tuple[str, int]] = set()
        for txt, s in zip(texts, srcs):
            b = gmap[s]
            seen.update(
                (" ".join(gram), b)
                for gram in ngrams(tokenize(txt or ""), ngram_size, min_length)
            )
        if not seen:
            return empty
        memo: dict[str, int] = {}

        def h64(g: str) -> int:
            h = memo.get(g)
            if h is None:
                h = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
                h = h - (1 << 64) if h >= 1 << 63 else h
                memo[g] = h
            return h

        hs = np.fromiter((h64(p[0]) for p in seen), np.int64, count=len(seen))
        bs = np.fromiter((p[1] for p in seen), np.int64, count=len(seen))
        part = (hs % num_partitions + num_partitions) % num_partitions
        return pa.table({"h": pa.array(hs), "bit": pa.array(bs), "part": pa.array(part)})

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "h" not in group.column_names:
            return pa.table(
                {"mask": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        import pandas as pd

        h = group["h"].to_numpy(zero_copy_only=False)
        b = group["bit"].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(h)
        masks = np.zeros(codes.max() + 1, np.int64)
        np.bitwise_or.at(masks, codes, np.int64(1) << b)
        uniq_masks, mask_codes = np.unique(masks, return_inverse=True)
        cnts = np.bincount(mask_codes)
        return pa.table(
            {"mask": pa.array(uniq_masks), "cnt": pa.array(cnts.astype(np.int64))}
        )

    tagged = ds.select_columns([text_column, group_column]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    hist = hash_partition_exchange(tagged, "part", num_partitions, fold).to_pandas()

    # ---- driver fold: masks -> pairwise matrix (|masks| integers, not rows)
    masks = hist["mask"].to_numpy() if "mask" in hist.columns else np.array([], np.int64)
    cnts = hist["cnt"].to_numpy() if "cnt" in hist.columns else np.array([], np.int64)
    k = len(groups)
    sizes = np.zeros(k, np.int64)
    inter = np.zeros((k, k), np.int64)
    for m, c in zip(masks, cnts):
        bits = [i for i in range(k) if m >> i & 1]
        for i in bits:
            sizes[i] += c
            for j in bits:
                if j > i:
                    inter[i, j] += c
    rows = {
        "source_a": [], "source_b": [], "n_a": [], "n_b": [],
        "n_common": [], "jaccard": [],
    }
    for i in range(k):
        for j in range(i + 1, k):
            union = sizes[i] + sizes[j] - inter[i, j]
            jac = 1.0 if union == 0 else inter[i, j] / union
            rows["source_a"].append(groups[i])
            rows["source_b"].append(groups[j])
            rows["n_a"].append(int(sizes[i]))
            rows["n_b"].append(int(sizes[j]))
            rows["n_common"].append(int(inter[i, j]))
            rows["jaccard"].append(float(jac))
    return ray.data.from_arrow(
        pa.table(
            {
                "source_a": pa.array(rows["source_a"], pa.string()),
                "source_b": pa.array(rows["source_b"], pa.string()),
                "n_a": pa.array(rows["n_a"], pa.int64()),
                "n_b": pa.array(rows["n_b"], pa.int64()),
                "n_common": pa.array(rows["n_common"], pa.int64()),
                "jaccard": pa.array(rows["jaccard"], pa.float64()),
            }
        )
    )
