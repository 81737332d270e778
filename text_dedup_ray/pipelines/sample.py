"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need splits and samples that are (a) reproducible
across runs and engines, (b) stable under repartitioning and scale-out, and
(c) cheap — no shuffle, no global sort, no RNG state. The standard public
technique is key hashing: map each row's id through a cryptographic hash to
a uniform number in [0, 1) and compare against fraction boundaries. Every
operator here is a stateless ``map_batches`` pass — embarrassingly parallel,
zero data movement — and every decision is re-derivable in SQL
(``('0x' || substr(md5(id::VARCHAR), 1, 8))::UBIGINT / 2^32``), which is what
the driver oracles check.

- ``hash_split``: append a ``split`` label column from fraction boundaries
  (e.g. train/val/test 0.8/0.1/0.1).
- ``sample_by_hash``: keep a deterministic ``fraction`` of rows.
- ``sample_per_group``: the n rows with the smallest key hash per group —
  a deterministic stratified sample, built on ``agg.grouped_top_k`` (the
  pre-pruned exchange: only candidates move, never the full table).

``salt`` decorrelates independent samples drawn from the same ids: the
hashed string is ``f"{salt}{id}"``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .agg import grouped_top_k

_U32 = float(2**32)
HASH_U32_SQL = "('0x' || substr(md5({expr}), 1, 8))::UBIGINT"


def _hash_u32(values, salt: str = "") -> np.ndarray:
    """First 32 bits (big-endian hex prefix) of md5(salt + str(v)) — the
    exact quantity ``HASH_U32_SQL`` computes in DuckDB."""
    return np.fromiter(
        (
            int(hashlib.md5(f"{salt}{v}".encode()).hexdigest()[:8], 16)
            for v in values
        ),
        np.uint32,
        count=len(values),
    )


def hash_split(
    ds: ray.data.Dataset,
    key: str,
    fractions: dict[str, float],
    salt: str = "",
    split_alias: str = "split",
) -> ray.data.Dataset:
    """Append a deterministic split label: row goes to the first split whose
    cumulative fraction exceeds ``hash_u32(key) / 2^32``. Fractions must sum
    to 1 (the last split absorbs rounding)."""
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names])
    bounds[-1] = 1.0 + 1e-12  # u < 1 always lands somewhere

    def assign(batch: pa.Table) -> pa.Table:
        u = _hash_u32(batch[key].to_pylist(), salt) / _U32
        idx = np.searchsorted(bounds, u, side="right")
        labels = np.array(names, dtype=object)[np.minimum(idx, len(names) - 1)]
        out = batch
        if split_alias in out.column_names:
            out = out.drop_columns([split_alias])
        return out.append_column(split_alias, pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def sample_by_hash(
    ds: ray.data.Dataset,
    key: str,
    fraction: float,
    salt: str = "",
) -> ray.data.Dataset:
    """Deterministic Bernoulli-style sample: keep rows with
    ``hash_u32(key) / 2^32 < fraction``. Stable across runs, partitionings,
    and cluster sizes; disjoint samples come from different salts."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = fraction * _U32

    def keep(batch: pa.Table) -> pa.Table:
        u = _hash_u32(batch[key].to_pylist(), salt)
        return batch.filter(pa.array(u < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_per_group(
    ds: ray.data.Dataset,
    group_key: str,
    id_key: str,
    n: int,
    salt: str = "",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Deterministic stratified sample: per group, the ``n`` rows with the
    smallest ``hash_u32(id)`` (id ascending breaks the astronomically rare
    hash tie). Block-local pre-prune + key-hash exchange via
    ``grouped_top_k`` — only ~groups x n candidate rows ever move."""

    def add_u(batch: pa.Table) -> pa.Table:
        u = _hash_u32(batch[id_key].to_pylist(), salt)
        out = batch
        if "__u32" in out.column_names:
            out = out.drop_columns(["__u32"])
        return out.append_column("__u32", pa.array(u.astype(np.int64)))

    hashed = ds.map_batches(add_u, batch_format="pyarrow")
    picked = grouped_top_k(
        hashed,
        group_key,
        [("__u32", "ascending"), (id_key, "ascending")],
        n,
        rank_alias=None,
        num_partitions=num_partitions,
    )
    return picked.map_batches(
        lambda t: t.drop_columns(["__u32"]), batch_format="pyarrow"
    )


def weighted_sample_by_group(
    ds: ray.data.Dataset,
    group_key: str,
    id_key: str,
    weights: dict[str, float],
    salt: str = "",
    default: float = 0.0,
) -> ray.data.Dataset:
    """Deterministic corpus MIXING: per-source sampling rates in one
    stateless zero-shuffle pass — the data-mixture step of a pretraining
    pipeline ("keep 100% of wiki, 30% of crawl, 5% of logs"). A row
    survives iff ``hash_u32(salt + id) / 2^32 < weights[group]``; groups
    absent from ``weights`` get ``default`` (0 = drop). Stable across
    runs, partitionings and cluster sizes; the same SQL expression as
    ``sample_by_hash`` re-derives it exactly."""
    for g, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {g!r} must be in [0, 1], got {w}")
    cuts = {str(g): w * _U32 for g, w in weights.items()}
    default_cut = default * _U32

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        u = _hash_u32(batch[id_key].to_pylist(), salt)
        thr = np.fromiter(
            (cuts.get(str(g), default_cut) for g in batch[group_key].to_pylist()),
            np.float64,
            count=batch.num_rows,
        )
        return batch.filter(pa.array(u < thr))

    return ds.map_batches(keep, batch_format="pyarrow")
