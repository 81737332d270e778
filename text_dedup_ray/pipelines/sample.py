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
import math

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


_U63 = 2**63
HASH_U63_SQL = (
    "(('0x' || substr(md5({expr}), 1, 16))::UBIGINT "
    "% 9223372036854775808)::BIGINT"
)


def _hash_u63(values, salt: str = "") -> np.ndarray:
    """First 63 bits of md5(salt + str(v)) as non-negative int64 — the
    exact quantity ``HASH_U63_SQL`` computes in DuckDB (the % 2^63 keeps
    the value inside BIGINT so both engines order it identically)."""
    return np.fromiter(
        (
            int(hashlib.md5(f"{salt}{v}".encode()).hexdigest()[:16], 16) % _U63
            for v in values
        ),
        np.int64,
        count=len(values),
    )


def seeded_shuffle(
    ds: ray.data.Dataset,
    id_column: str,
    seed: int = 42,
    rows_per_shard: int | None = None,
    num_partitions: int = 16,
    samples_per_block: int = 32,
    pos_alias: str = "shuffle_pos",
    shard_alias: str = "shard",
) -> ray.data.Dataset:
    """Deterministic global shuffle for training export: stamp every row
    with its 0-based position under the seeded-hash order (md5-63(seed:id)
    ASC, id ASC) — SQL ``row_number() OVER (ORDER BY hash(id), id) - 1``.
    With ``rows_per_shard`` also stamp ``shard = pos // rows_per_shard``,
    the output-shard assignment a resumable export writes by.

    Unlike ``ds.random_shuffle()`` this is reproducible from the seed
    alone (re-running a killed export yields byte-identical shard
    membership), and the order is auditable in SQL. Mechanics mirror
    select_token_budget's exact global ranking: sampled range boundaries
    (P cuts on the driver), per-range row counts -> exclusive base
    offsets (P integers), one range exchange + in-partition C++ sort.
    Rows move through the exchange exactly once — that single all-to-all
    IS the shuffle and is inherent to the semantics; pass a slim
    (id-only) dataset to build just the manifest. Hash ties land in one
    range partition by construction, so the id tie-break is global."""
    from ..stages.exchange import hash_partition_exchange

    base_schema = ds.schema().base_schema
    out_fields = list(base_schema) + [pa.field(pos_alias, pa.int64())]
    if rows_per_shard is not None:
        out_fields.append(pa.field(shard_alias, pa.int64()))
    out_schema = pa.schema(out_fields)
    salt = f"{seed}:"

    def _empty() -> pa.Table:
        return pa.table(
            {f.name: pa.array([], f.type) for f in out_schema}
        )

    def key(batch: pa.Table) -> np.ndarray:
        return _hash_u63(batch[id_column].to_pylist(), salt)

    def sample(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        v = np.sort(key(batch))
        step = max(1, len(v) // samples_per_block)
        return pa.table({"k": pa.array(v[::step][:samples_per_block])})

    pool_df = ds.map_batches(
        sample, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if "k" not in pool_df.columns or len(pool_df) == 0:
        return ray.data.from_arrow(_empty())
    pool = np.sort(pool_df["k"].to_numpy())
    cuts = np.unique(
        pool[np.linspace(0, len(pool) - 1, num_partitions + 1).astype(int)][1:-1]
    )
    bounds_ref = ray.put(cuts)

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "__k", pa.array([], pa.int64())
            ).append_column("__rp", pa.array([], pa.int64()))
        b = ray.get(bounds_ref)
        k = key(batch)
        part = np.searchsorted(b, k, side="right").astype(np.int64)
        return batch.append_column("__k", pa.array(k)).append_column(
            "__rp", pa.array(part)
        )

    tagged = ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)

    def counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"__rp": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        acc = np.bincount(
            batch["__rp"].to_numpy(zero_copy_only=False), minlength=len(cuts) + 1
        )
        nz = np.flatnonzero(acc)
        return pa.table(
            {"__rp": pa.array(nz.astype(np.int64)), "n": pa.array(acc[nz].astype(np.int64))}
        )

    cnt = (
        tagged.select_columns(["__rp"])
        .map_batches(counts, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    per_part = np.zeros(len(cuts) + 1, np.int64)
    if len(cnt):
        np.add.at(per_part, cnt["__rp"].to_numpy(), cnt["n"].to_numpy())
    base = np.concatenate(([0], np.cumsum(per_part)[:-1]))
    base_ref = ray.put(base)

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "__k" not in group.column_names:
            return _empty()
        bb = ray.get(base_ref)
        p = int(group["__rp"][0].as_py())
        s = group.sort_by([("__k", "ascending"), (id_column, "ascending")])
        pos = bb[p] + np.arange(s.num_rows, dtype=np.int64)
        out = s.drop_columns(["__k", "__rp"]).append_column(
            pos_alias, pa.array(pos)
        )
        if rows_per_shard is not None:
            out = out.append_column(
                shard_alias, pa.array(pos // int(rows_per_shard))
            )
        return out

    return hash_partition_exchange(tagged, "__rp", len(cuts) + 1, fold)


def leakage_safe_split(
    ds: ray.data.Dataset,
    fractions: dict[str, float],
    text_column: str = "text",
    cluster_map: ray.data.Dataset | None = None,
    id_column: str | None = None,
    salt: str = "",
    split_alias: str = "split",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Train/val/test split that can never put two copies of a document on
    different sides — the standard guard against eval contamination.

    Without ``cluster_map`` the split key is the row's CONTENT (the md5
    hash-split applied to ``text_column``), so byte-identical duplicates
    land in the same split by construction: one stateless ``map_batches``
    pass, zero shuffle, and fully SQL-re-derivable (the driver oracle).

    With ``cluster_map`` — a ``(row_id, cluster_id)`` Dataset from ANY
    dedup family (exact, MinHash, SimHash, phash, ...) — every row joins
    its cluster root through ONE co-partition hash-join exchange and the
    ROOT id becomes the split key, extending the no-leak guarantee to
    near-duplicate clusters. Rows absent from the map (the map may carry
    non-trivial entries only) are their own singleton cluster (root =
    their row id)."""
    if cluster_map is None:
        return hash_split(ds, text_column, fractions, salt, split_alias)

    from ..sources.io import ROW_ID, stamp_row_ids_from_key
    from .joins import hash_join

    if id_column is not None:
        ds = stamp_row_ids_from_key(ds, id_column)
    cols = [c for c in ds.schema().base_schema.names]
    joined = hash_join(
        ds,
        cluster_map.select_columns([ROW_ID, "cluster_id"]),
        left_on=ROW_ID,
        right_on=ROW_ID,
        left_columns=cols,
        right_columns=["cluster_id"],
        how="left",
        num_partitions=num_partitions,
    )

    def root_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        root = pc.coalesce(
            batch["cluster_id"].cast(pa.int64()), batch[ROW_ID].cast(pa.int64())
        )
        out = batch.drop_columns(["cluster_id"])
        if "__split_root" in out.column_names:
            out = out.drop_columns(["__split_root"])
        return out.append_column("__split_root", root)

    keyed = joined.map_batches(root_key, batch_format="pyarrow")
    labeled = hash_split(keyed, "__split_root", fractions, salt, split_alias)
    return labeled.map_batches(
        lambda t: t.drop_columns(["__split_root"]), batch_format="pyarrow"
    )


def weighted_reservoir_topk(
    ds: ray.data.Dataset,
    id_key: str,
    weight_column: str,
    k: int,
    salt: str = "",
    key_alias: str | None = None,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """Deterministic weighted sample WITHOUT replacement: Efraimidis–
    Spirakis A-Res (Inf. Proc. Letters 97(5), 2006 — public). Row *i* gets
    sort key ``ln(u_i) / w_i`` with ``u_i = (md5_63(salt + id) + 0.5) /
    2^63``; the ``k`` LARGEST keys are exactly a weighted sample without
    replacement (equivalent to the paper's ``u**(1/w)`` keys in log space).
    Hash-seeded, so the draw is stable across runs, partitionings and
    cluster sizes, and a SQL oracle re-derives it verbatim::

        ln(((h)::DOUBLE + 0.5) / 9223372036854775808.0) / w

    with ``h = HASH_U63_SQL`` — both sides evaluate the identical double
    expression (cast → +0.5 → divide → log → divide, in that order), so
    the keys match bitwise (asserted in tests/test_weighted_topk.py).

    Scale shape: the key stamp is a stateless ``map_batches`` pass; the
    global top-k reuses :func:`agg.grouped_top_k` on a constant group, so
    each block pre-prunes to its local ``k`` and only O(blocks × k)
    candidate rows ever move. Weights must be > 0 (a zero weight has no
    ES semantics); violations raise inside the stamping pass.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def stamp(batch: pa.Table) -> pa.Table:
        out = batch
        for c in ("__es_key", "__es_g"):
            if c in out.column_names:
                out = out.drop_columns([c])
        if batch.num_rows == 0:
            out = out.append_column("__es_key", pa.array([], pa.float64()))
            return out.append_column("__es_g", pa.array([], pa.int64()))
        w = batch[weight_column].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.any(~(w > 0)):
            bad = batch[weight_column].to_pylist()
            bad = next(x for x in bad if not (x is not None and x > 0))
            raise ValueError(
                f"weighted_reservoir_topk: weight column {weight_column!r} "
                f"must be > 0 everywhere (found {bad!r})"
            )
        h = _hash_u63(batch[id_key].to_pylist(), salt).astype(np.float64)
        u = (h + 0.5) / _U63
        # libm log (math.log == DuckDB ln, bit-identical), not np.log —
        # numpy's SIMD log drifts 1 ulp from libm, and the oracle contract
        # here is exact key equality. The md5 per row above dominates cost.
        key = (
            np.fromiter((math.log(x) for x in u), np.float64, count=len(u)) / w
        )
        out = out.append_column("__es_key", pa.array(key))
        return out.append_column(
            "__es_g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    picked = grouped_top_k(
        stamped,
        "__es_g",
        [("__es_key", "descending"), (id_key, "ascending")],
        k,
        rank_alias=None,
        num_partitions=num_partitions,
    )

    def clean(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__es_g"])
        if key_alias is None:
            return t.drop_columns(["__es_key"])
        return t.rename_columns(
            [key_alias if c == "__es_key" else c for c in t.column_names]
        )

    return picked.map_batches(clean, batch_format="pyarrow")
