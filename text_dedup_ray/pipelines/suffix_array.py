"""Exact-substring dedup (suffix-array) pipeline.

Reference lifecycle (suffix_array.py:22-109): serialize the WHOLE corpus to
one bytes file single-threaded -> external Rust suffix array -> global
duplicate byte ranges -> restore to per-doc slices -> cut -> drop empties.

Ray version: each partition of documents is one independent corpus — inside
``map_batches`` (whole-block batches) the partition's docs are concatenated
with recorded boundaries (like suffix_array.py:48-56), a numpy suffix array
finds duplicated ranges >= length_threshold, and the reference's
restore/merge/cut semantics (functions/intervals.py) map them back to
per-doc slices.

PARTITIONING ASSUMPTION (SURVEY §7.4): duplicates are detected *within* a
partition; a verbatim run shared only across partitions is missed. At scale
this is the standard locality trade (the reference needs the entire corpus
in one suffix array — impossible at 100 TB). Mitigations: (a) sort/bucket
inputs so near-neighbors co-locate, (b) a cross-partition pass shuffling
length-L boundary grams (future work — documented, not silent).

Docs whose text becomes empty after cutting are dropped
(suffix_array.py:93-97).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.intervals import clean_up, restore_and_merge
from ..functions.suffixarray import duplicate_byte_ranges


def suffix_array_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    length_threshold: int = 100,
    merge_strategy: str = "longest",
    partition_size_rows: int | None = None,
    drop_empty: bool = True,
) -> ray.data.Dataset:
    """Cut duplicated byte runs >= length_threshold out of every document."""
    if partition_size_rows:
        # bound per-partition corpus size so the O(n log^2 n) build stays cheap
        count = ds.count()
        ds = ds.repartition(max(1, count // partition_size_rows))

    def dedup_partition(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        if not texts:
            return batch
        encoded = [t.encode("utf-8") for t in texts]
        boundaries = []
        off = 0
        for e in encoded:
            boundaries.append((off, off + len(e)))
            off += len(e)
        data = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        ranges = duplicate_byte_ranges(data, length_threshold)
        per_doc, _dup_size = restore_and_merge(
            boundaries, ranges, length_threshold, merge_strategy
        )
        new_texts = [
            clean_up(t, slices) if slices else t for t, slices in zip(texts, per_doc)
        ]
        idx = batch.column_names.index(text_column)
        out = batch.set_column(idx, text_column, pa.array(new_texts, pa.string()))
        if drop_empty:
            mask = pa.array([bool(t) for t in new_texts])
            out = out.filter(mask)
        return out

    return ds.map_batches(dedup_partition, batch_format="pyarrow", batch_size=None)
