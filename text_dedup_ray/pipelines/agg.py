"""Pre-aggregated grouped aggregates + tumbling-window aggregates.

The scale rule (SURVEY §4, ray_guide "Aggregation at scale"): never ship raw
rows into a ``groupby`` — combine per block first (one row per key per
block), then shuffle only the partials. ``grouped_sum_count`` implements the
partial/combiner pattern generically; ``tumbling_window_agg`` applies it to
event-time windows (Ray Data has no native windowing: the window key is
computed per batch with ``pyarrow.compute.floor_temporal``; ordering within a
window is irrelevant for the supported associative aggregates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..stages.exchange import distinct_key_partition


def grouped_sum_count(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_columns: list[str],
    count_alias: str = "n",
) -> ray.data.Dataset:
    """groupby(keys) with COUNT(*) + SUM(cols), pre-aggregated per block."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = keys + sum_columns
        tbl = batch.select(cols)
        # within-block combine via pyarrow's hash aggregation
        out = tbl.group_by(keys).aggregate(
            [(c, "sum") for c in sum_columns] + [(keys[0], "count")]
        )
        renames = {f"{c}_sum": f"__p_{c}" for c in sum_columns}
        renames[f"{keys[0]}_count"] = "__p_n"
        return out.rename_columns([renames.get(c, c) for c in out.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    aggs = [Sum(f"__p_{c}", alias_name=c) for c in sum_columns]
    aggs.append(Sum("__p_n", alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def tumbling_window_agg(
    ds: ray.data.Dataset,
    ts_column: str,
    key_column: str,
    value_column: str | None = None,
    window: str = "hour",
    window_alias: str = "window_start",
) -> ray.data.Dataset:
    """Tumbling event-time windows: (key, floor(ts, window)) -> count [+ sum].

    ``window`` is a pyarrow floor_temporal unit ('minute', 'hour', 'day').
    """

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_column], unit=window)
        return batch.append_column(window_alias, w)

    windowed = ds.map_batches(add_window, batch_format="pyarrow")
    sums = [value_column] if value_column else []
    return grouped_sum_count(windowed, [key_column, window_alias], sums)


def sliding_window_agg(
    ds: ray.data.Dataset,
    ts_column: str,
    key_column: str,
    value_column: str | None = None,
    window_s: int = 3600,
    hop_s: int = 900,
    window_alias: str = "window_start",
    count_alias: str = "n",
) -> ray.data.Dataset:
    """Sliding (hopping) event-time windows: every event lands in the
    ``window_s / hop_s`` overlapping windows covering its timestamp (all
    starts on the epoch-aligned hop grid). The overlap factor multiplies
    rows, so the explode happens INSIDE the block partial: each block
    emits one pre-aggregated (key, window_start, sum, count) row per
    distinct pair — the shuffle moves partials, never the exploded
    events. Requires ``window_s % hop_s == 0`` (the standard hopping
    grid)."""
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    n_cov = window_s // hop_s
    hop_us = hop_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_column: pa.array([], pa.string()),
                window_alias: pa.array([], pa.timestamp("us")),
                "__p_v": pa.array([], pa.float64()),
                "__p_n": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        import pandas as pd

        ts = batch[ts_column].cast(pa.int64()).to_numpy(zero_copy_only=False)
        latest = (ts // hop_us) * hop_us  # floor to the hop grid
        m = batch.num_rows
        starts = np.repeat(latest, n_cov) - np.tile(
            np.arange(n_cov, dtype=np.int64) * hop_us, m
        )
        keys = np.repeat(
            np.array(batch[key_column].to_pylist(), dtype=object), n_cov
        )
        vals = (
            np.repeat(
                batch[value_column].to_numpy(zero_copy_only=False).astype(np.float64),
                n_cov,
            )
            if value_column
            else np.zeros(m * n_cov)
        )
        codes, uniq_keys = pd.factorize(keys)
        su, inv_s = np.unique(starts, return_inverse=True)
        combo = codes.astype(np.int64) * len(su) + inv_s
        uc, inv_c = np.unique(combo, return_inverse=True)
        vsum = np.zeros(len(uc))
        np.add.at(vsum, inv_c, vals)
        cnt = np.bincount(inv_c, minlength=len(uc)).astype(np.int64)
        out_keys = uniq_keys[(uc // len(su)).astype(np.int64)]
        out_starts = su[(uc % len(su)).astype(np.int64)]
        return pa.table(
            {
                key_column: pa.array(out_keys.tolist(), pa.string()),
                window_alias: pa.array(out_starts).cast(pa.timestamp("us")),
                "__p_v": pa.array(vsum),
                "__p_n": pa.array(cnt),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    aggs = [Sum("__p_n", alias_name=count_alias)]
    if value_column:
        aggs.insert(0, Sum("__p_v", alias_name=f"sum_{value_column}"))
    return partials.groupby([key_column, window_alias]).aggregate(*aggs)


def exact_quantiles(
    ds: ray.data.Dataset,
    column: str,
    quantiles: dict[str, float],
    num_partitions: int = 16,
) -> pa.Table:
    """EXACT distributed quantiles for an integer-valued column via
    value-count partial aggregation: each block emits (value, count) pairs,
    the hash exchange merges counts per value, and the driver folds only the
    distinct-value histogram — never the rows. Returns ONE row with one
    column per ``quantiles`` key.

    Semantics match SQL ``quantile_disc``: the element at 1-based rank
    ``ceil(q * n)`` of the sorted multiset. Cardinality contract: the number
    of DISTINCT values is small relative to the rows (lengths, token counts,
    sizes — the columns you actually take quantiles of); an unbounded double
    column wants a sketch (t-digest) instead, which this engine does not
    claim."""
    from ..stages.exchange import hash_partition_exchange

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        part = (np.abs(vals) % num_partitions).astype(np.int64)
        return pa.table(
            {"value": vals, "cnt": cnts.astype(np.int64), "part": part}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "value" not in group.column_names:
            return pa.table({"value": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        v = group["value"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v_s, c_s = v[order], c[order]
        brk = np.r_[True, v_s[1:] != v_s[:-1]]
        starts = np.flatnonzero(brk)
        sums = np.add.reduceat(c_s, starts)
        return pa.table({"value": v_s[starts], "cnt": sums.astype(np.int64)})

    hist = hash_partition_exchange(pre, "part", num_partitions, merge).to_pandas()
    if hist.empty:
        return pa.table({name: pa.array([None], pa.int64()) for name in quantiles})
    hist = hist.sort_values("value")
    vals = hist["value"].to_numpy()
    cum = np.cumsum(hist["cnt"].to_numpy())
    n = int(cum[-1])
    out = {}
    for name, q in quantiles.items():
        rank = min(max(int(np.ceil(q * n)), 1), n)  # quantile_disc rule
        out[name] = pa.array([int(vals[np.searchsorted(cum, rank)])], pa.int64())
    return pa.table(out)


def approx_quantiles(
    ds: ray.data.Dataset,
    column: str,
    id_column: str,
    quantiles: dict[str, float],
    k: int = 4096,
    salt: str = "",
) -> pa.Table:
    """Approximate quantiles for UNBOUNDED-cardinality columns (the gap
    ``exact_quantiles``' histogram contract documents): a deterministic
    bottom-k-by-hash uniform row sample. Every block keeps its k rows
    with the smallest ``hash_u32(salt + id)`` (ties by id), one
    single-partition fold keeps the global bottom-k — bottom-k is
    mergeable, so the sample (and every estimate) is EXACTLY
    partition-invariant and SQL-recomputable (ORDER BY the same md5
    expression LIMIT k), not just statistically stable. Rank error is
    the standard sampling bound O(1/sqrt(k)). Returns one row with
    ``quantile_disc``-rule values over the sample."""
    from ..pipelines.sample import _hash_u32
    from ..stages.exchange import tree_fold

    def bottom_k(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "v": pa.array([], pa.float64()),
                "h": pa.array([], pa.int64()),
                "i": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        h = _hash_u32(ids.tolist(), salt).astype(np.int64)
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ids, h))[:k]
        return pa.table(
            {
                "v": pa.array(v[order]),
                "h": pa.array(h[order]),
                "i": pa.array(ids[order].astype(np.int64)),
                "part": pa.array(np.zeros(len(order), np.int64)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        # bottom-k is mergeable: bottom-k of concatenated bottom-ks ==
        # global bottom-k, so each tree level keeps <= k rows (same schema)
        if group.num_rows == 0 or "h" not in group.column_names:
            return pa.table(
                {
                    "v": pa.array([], pa.float64()),
                    "h": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        h = group["h"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, h))[:k]
        sel = pa.array(order)
        return pa.table(
            {
                "v": group["v"].take(sel),
                "h": group["h"].take(sel),
                "i": group["i"].take(sel),
                "part": pa.array(np.zeros(len(order), np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "h" not in group.column_names:
            return pa.table({"v": pa.array([], pa.float64())})
        h = group["h"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, h))[:k]
        return pa.table({"v": pa.array(v[order])})

    pre = ds.map_batches(bottom_k, batch_format="pyarrow", batch_size=None)
    sample = tree_fold(pre, combine, fold).to_pandas()
    if sample.empty:
        return pa.table({name: pa.array([None], pa.float64()) for name in quantiles})
    vals = np.sort(sample["v"].to_numpy())
    n = len(vals)
    out = {}
    for name, q in quantiles.items():
        rank = min(max(int(np.ceil(q * n)), 1), n)  # quantile_disc rule
        out[name] = pa.array([float(vals[rank - 1])], pa.float64())
    return pa.table(out)


def grouped_quantiles(
    ds: ray.data.Dataset,
    key: str,
    column: str,
    quantiles: dict[str, float],
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """EXACT per-group quantiles (``quantile_disc`` semantics) — the grouped
    form of ``exact_quantiles``: blocks pre-aggregate (key, value, count)
    histogram rows, the exchange co-locates each KEY's whole histogram by
    key hash, and one vectorized fold per partition walks each key's sorted
    cumulative counts. Returns one row per key with one column per
    ``quantiles`` name. Same cardinality contract as ``exact_quantiles``,
    now per group."""
    from ..stages.exchange import hash_partition_exchange

    key_type = ds.schema().base_schema.field(key).type

    def partial(batch: pa.Table) -> pa.Table:
        tbl = batch.select([key, column])
        out = tbl.group_by([key, column]).aggregate([(column, "count")])
        out = out.rename_columns([key, column, "__cnt"])
        kv = out[key].to_numpy(zero_copy_only=False)
        part = distinct_key_partition(kv, num_partitions)
        return out.append_column("part", pa.array(part))

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def fold(group: pa.Table) -> pa.Table:
        names = list(quantiles)
        empty_cols = {key: pa.array([], key_type)}
        empty_cols.update({n: pa.array([], pa.int64()) for n in names})
        if group.num_rows == 0 or key not in group.column_names:
            return pa.table(empty_cols)
        # merge per-block partial counts, then walk each key's histogram
        merged = (
            group.select([key, column, "__cnt"])
            .group_by([key, column])
            .aggregate([("__cnt", "sum")])
        )
        merged = merged.rename_columns([key, column, "__cnt"])
        s = merged.sort_by([(key, "ascending"), (column, "ascending")])
        kv = s[key].to_numpy(zero_copy_only=False)
        vals = s[column].to_numpy(zero_copy_only=False)
        cnts = s["__cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        brk = np.r_[True, kv[1:] != kv[:-1]]
        starts = np.flatnonzero(np.r_[brk, True])
        out_keys, out_qs = [], {n: [] for n in names}
        csum = np.cumsum(cnts)
        for a, b in zip(starts[:-1], starts[1:]):
            base = csum[a - 1] if a else 0
            cum = csum[a:b] - base
            n_rows = int(cum[-1])
            out_keys.append(kv[a])
            for nname, q in quantiles.items():
                rank = min(max(int(np.ceil(q * n_rows)), 1), n_rows)
                out_qs[nname].append(int(vals[a + np.searchsorted(cum, rank)]))
        cols = {key: pa.array(out_keys, key_type)}
        cols.update({n: pa.array(out_qs[n], pa.int64()) for n in names})
        return pa.table(cols)

    return hash_partition_exchange(pre, "part", num_partitions, fold)


def filter_by_quantile(
    ds: ray.data.Dataset,
    column: str,
    q: float,
    keep: str = "ge",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Keep rows whose ``column`` is >= (``keep="ge"``) or < (``keep="lt"``)
    the exact q-quantile of that column — the standard percentile-gate for
    quality scores. The cut is ONE scalar from the histogram-only
    ``exact_quantiles`` fold (rows never leave the cluster), then a
    stateless vectorized filter pass."""
    if keep not in ("ge", "lt"):
        raise ValueError(f"keep must be 'ge' or 'lt', got {keep!r}")
    cut_tbl = exact_quantiles(ds, column, {"q": q}, num_partitions)
    cut = cut_tbl["q"][0].as_py()
    if cut is None:  # empty input
        return ds

    def f(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False)
        mask = v >= cut if keep == "ge" else v < cut
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def grouped_count_distinct(
    ds: ray.data.Dataset,
    key: str,
    value_column: str,
    alias: str = "n_distinct",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """COUNT(DISTINCT value) per group without shuffling raw rows: blocks
    pre-dedup (key, value) pairs locally, pairs co-locate by hash(value)
    through the exchange (every copy of a pair lands in one partition, so a
    second local dedup is globally exact), each partition emits per-key
    partial counts, and a tiny partials-only groupby sums them. Skew note:
    partitioning is by the VALUE hash — one value hot across many groups
    concentrates in one partition, the same contract as the dedup exchanges."""
    from ..stages.exchange import hash_partition_exchange

    key_type = ds.schema().base_schema.field(key).type

    def partial(batch: pa.Table) -> pa.Table:
        pairs = batch.select([key, value_column]).group_by([key, value_column]).aggregate([])
        v = pairs[value_column].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (np.abs(v) % num_partitions).astype(np.int64)
        return pairs.append_column("part", pa.array(part))

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def reduce(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key not in group.column_names:
            return pa.table({key: pa.array([], key_type), "__pcd": pa.array([], pa.int64())})
        pairs = group.select([key, value_column]).group_by([key, value_column]).aggregate([])
        out = pairs.group_by([key]).aggregate([(value_column, "count")])
        return out.rename_columns([key, "__pcd"])

    partials = hash_partition_exchange(pre, "part", num_partitions, reduce)
    summed = grouped_sum_count(partials, [key], ["__pcd"], count_alias="__np")
    return summed.map_batches(
        lambda t: pa.table({key: t[key], alias: t["__pcd"].cast(pa.int64())}),
        batch_format="pyarrow",
    )


def _topk_block(
    tbl: pa.Table,
    key: str,
    order_by: list[tuple[str, str]],
    k: int,
    rank_alias: str | None = None,
) -> pa.Table:
    """Keep each key's first ``k`` rows under ``order_by`` (C++ multi-key
    sort, then one vectorized within-group rank pass). The same kernel is the
    block-local combiner AND the per-partition finalizer — top-k is
    idempotent under concatenation, which is what makes the partial/merge
    split exact."""
    if tbl.num_rows == 0:
        return tbl
    s = tbl.sort_by([(key, "ascending")] + list(order_by))
    kv = s[key].to_numpy(zero_copy_only=False)
    brk = np.r_[True, kv[1:] != kv[:-1]]
    starts = np.flatnonzero(brk)
    grp = np.cumsum(brk) - 1
    idx_in_grp = np.arange(len(kv)) - starts[grp]
    mask = idx_in_grp < k
    out = s.filter(pa.array(mask))
    if rank_alias is not None:
        out = out.append_column(
            rank_alias, pa.array((idx_in_grp[mask] + 1).astype(np.int64))
        )
    return out


def grouped_top_k(
    ds: ray.data.Dataset,
    key: str,
    order_by: list[tuple[str, str]],
    k: int,
    rank_alias: str | None = "rank",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Top-k rows PER KEY under a deterministic multi-column order (make the
    last order column a unique id so ties can't flap). Blocks pre-prune to
    their local top-k (<= keys x k rows leave any block), survivors co-locate
    by key hash through the exchange, and one finalizer pass per partition
    emits the global per-key top-k with a 1-based ``rank_alias`` column —
    raw rows never shuffle, so the exchange moves O(distinct_keys x k), not
    O(rows)."""
    import hashlib

    from ..stages.exchange import hash_partition_exchange

    def part_of(vals) -> pa.Array:
        return pa.array(
            np.fromiter(
                (
                    int.from_bytes(
                        hashlib.sha1(str(v).encode()).digest()[:8], "little"
                    )
                    % num_partitions
                    for v in vals
                ),
                np.int64,
                count=len(vals),
            )
        )

    def partial(batch: pa.Table) -> pa.Table:
        pruned = _topk_block(batch, key, order_by, k)
        if pruned.num_rows == 0:
            return pruned.append_column("__tk_part", pa.array([], pa.int64()))
        return pruned.append_column(
            "__tk_part", part_of(pruned[key].to_pylist())
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key not in group.column_names:
            return pa.table({})
        return _topk_block(
            group.drop_columns(["__tk_part"]), key, order_by, k, rank_alias
        )

    return hash_partition_exchange(pre, "__tk_part", num_partitions, finalize)


def grouped_vector_mean(
    ds: ray.data.Dataset,
    key: str,
    vector_column: str,
    num_partitions: int = 16,
    mean_alias: str = "mean",
) -> ray.data.Dataset:
    """Per-group centroid of a ``list<float>`` column (class centroids /
    embedding averages). Blocks pre-reduce to one (key, sum-vector, count)
    partial per key (vectorized ``np.add.at`` over the stacked block
    matrix); partials co-locate by key hash; the fold emits LONG-format
    (key, dim, mean) rows — one row per key per dimension, float64 — so
    results hash-compare exactly against SQL unnest-with-ordinality
    aggregation."""
    import hashlib as _h

    from ..stages.exchange import hash_partition_exchange

    key_type = ds.schema().base_schema.field(key).type

    def _key_part(vals) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(_h.sha1(str(v).encode()).digest()[:8], "little")
                % num_partitions
                for v in vals
            ),
            np.int64,
            count=len(vals),
        )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], key_type),
                "__sum": pa.array([], pa.list_(pa.float64())),
                "__n": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        m = np.array(batch[vector_column].to_pylist(), dtype=np.float64)
        kv = batch[key].to_pylist()
        uniq, inv = np.unique(np.array(kv, dtype=object), return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                key: pa.array(uniq.tolist(), key_type),
                "__sum": pa.array([r.tolist() for r in sums], pa.list_(pa.float64())),
                "__n": pa.array(cnt),
                "part": pa.array(_key_part(uniq.tolist())),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], key_type),
                "dim": pa.array([], pa.int64()),
                mean_alias: pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        kv = group[key].to_pylist()
        sums = np.array(group["__sum"].to_pylist(), dtype=np.float64)
        cnts = group["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(np.array(kv, dtype=object), return_inverse=True)
        tot = np.zeros((len(uniq), sums.shape[1]), np.float64)
        np.add.at(tot, inv, sums)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(n, inv, cnts)
        means = tot / n[:, None]
        k_out = np.repeat(np.arange(len(uniq)), sums.shape[1])
        dims = np.tile(np.arange(sums.shape[1], dtype=np.int64), len(uniq))
        return pa.table(
            {
                key: pa.array([uniq[i] for i in k_out], key_type),
                "dim": pa.array(dims),
                mean_alias: pa.array(means.reshape(-1)),
            }
        )

    return hash_partition_exchange(pre, "part", num_partitions, fold)


def with_global_cdf(
    ds: ray.data.Dataset,
    column: str,
    alias: str = "cdf",
    num_partitions: int = 16,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Stamp each row's exact corpus-wide cumulative distribution value
    (SQL ``cume_dist() OVER (ORDER BY column)`` = rows <= v / N) without a
    global sort: the (value, count) histogram folds through the exchange
    (same cardinality contract as ``exact_quantiles``), the driver builds
    the cumulative map once, and a stateless broadcast ``searchsorted``
    pass stamps every row — raw rows never shuffle."""
    from ..stages.exchange import hash_partition_exchange

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"value": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64()),
                 "part": pa.array([], pa.int64())}
            )
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table(
            {"value": vals, "cnt": cnts.astype(np.int64),
             "part": (np.abs(vals) % num_partitions).astype(np.int64)}
        )

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "value" not in group.column_names:
            return pa.table(
                {"value": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        v = group["value"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v_s, c_s = v[order], c[order]
        brk = np.r_[True, v_s[1:] != v_s[:-1]]
        starts = np.flatnonzero(brk)
        return pa.table(
            {"value": v_s[starts],
             "cnt": np.add.reduceat(c_s, starts).astype(np.int64)}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    hist = hash_partition_exchange(pre, "part", num_partitions, merge).to_pandas()
    hist = hist.sort_values("value")
    vals = np.ascontiguousarray(hist["value"].to_numpy())
    cum = np.cumsum(hist["cnt"].to_numpy()).astype(np.float64)
    n = float(cum[-1]) if len(cum) else 1.0
    table_ref = ray.put((vals, cum))

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        tv, tc = ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(tv, v, side="right") - 1
        cdf = np.round(tc[pos] / n, round_to)
        return batch.append_column(alias, pa.array(cdf))

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def grouped_zscore(
    ds: ray.data.Dataset,
    key: str,
    column: str,
    alias: str = "z",
    num_partitions: int = 8,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Stamp each row's within-group z-score (population std) from EXACT
    int64 (sum, sum-of-squares, count) partials: blocks pre-reduce to one
    partial per key, a key-hash exchange folds them, the tiny per-key
    moment table broadcasts once, and a stateless pass stamps rows. Both
    this engine and the SQL oracle derive mean/std from the same exact
    integers with the same expression — bit-identical doubles. Zero
    variance (or singleton groups) yields NULL, matching the SQL guard."""
    import hashlib as _h

    from ..stages.exchange import hash_partition_exchange

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"k": pa.array([], pa.string()), "s": pa.array([], pa.int64()),
             "ss": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
             "part": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        # exact-integer contract guard: v*v and its per-block sum must fit
        # int64, else numpy wraps silently and the stats are garbage
        amax = int(np.abs(v).max()) if len(v) else 0
        if amax > 3_037_000_499:
            raise ValueError(
                f"grouped_zscore: |{column}| up to {amax} overflows int64 when "
                "squared; rescale the column or use a float pipeline"
            )
        if amax and len(v) > (2**63 - 1) // (amax * amax):
            raise ValueError(
                f"grouped_zscore: block of {len(v)} rows with |{column}| up to "
                f"{amax} can overflow the int64 sum-of-squares accumulator"
            )
        kv = np.array([str(x) for x in batch[key].to_pylist()], dtype=object)
        uniq, inv = np.unique(kv, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        ss = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, v)
        np.add.at(ss, inv, v * v)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        part = np.fromiter(
            (int.from_bytes(_h.sha1(k.encode()).digest()[:8], "little")
             % num_partitions for k in uniq),
            np.int64, count=len(uniq),
        )
        return pa.table(
            {"k": pa.array(uniq.tolist(), pa.string()), "s": pa.array(s),
             "ss": pa.array(ss), "n": pa.array(n), "part": pa.array(part)}
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"k": pa.array([], pa.string()), "s": pa.array([], pa.int64()),
             "ss": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "k" not in group.column_names:
            return empty
        kv = np.array(group["k"].to_pylist(), dtype=object)
        uniq, inv = np.unique(kv, return_inverse=True)
        out = {}
        for c in ("s", "ss", "n"):
            # the fold table is tiny (<= keys x partials), so exact Python
            # ints are free — and they surface int64 overflow as an error
            # instead of numpy's silent wrap
            acc_py = [0] * len(uniq)
            for i, val in zip(inv.tolist(), group[c].to_pylist()):
                acc_py[i] += val
            if any(abs(x) > 2**63 - 1 for x in acc_py):
                raise ValueError(
                    f"grouped_zscore: folded '{c}' exceeds int64 — rescale "
                    "the column or use a float pipeline"
                )
            out[c] = np.array(acc_py, np.int64)
        return pa.table(
            {"k": pa.array(uniq.tolist(), pa.string()), "s": pa.array(out["s"]),
             "ss": pa.array(out["ss"]), "n": pa.array(out["n"])}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    moments = hash_partition_exchange(pre, "part", num_partitions, fold).to_pandas()
    mkeys = np.sort(np.array(moments["k"].tolist(), dtype=object))
    order = np.argsort(np.array(moments["k"].tolist(), dtype=object), kind="stable")
    ms = moments["s"].to_numpy()[order].astype(np.float64)
    mss = moments["ss"].to_numpy()[order].astype(np.float64)
    mn = moments["n"].to_numpy()[order].astype(np.float64)
    moments_ref = ray.put((mkeys, ms, mss, mn))

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        tk, ts, tss, tn = (
            ray.get(moments_ref) if isinstance(moments_ref, ray.ObjectRef) else moments_ref
        )
        kv = np.array([str(x) for x in batch[key].to_pylist()], dtype=object)
        pos = np.searchsorted(tk, kv)
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        mean = ts[pos] / tn[pos]
        var = tss[pos] / tn[pos] - mean * mean
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.round((v - mean) / np.sqrt(var), round_to)
        mask = var > 0
        return batch.append_column(alias, pa.array(np.where(mask, z, np.nan), pa.float64(), mask=~mask))

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def with_lag_lead(
    ds: ray.data.Dataset,
    key: str,
    order_column: str,
    value_column: str,
    lags: tuple[int, ...] = (1,),
    leads: tuple[int, ...] = (),
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-key LAG/LEAD window stamping (SQL ``lag(value, n) OVER
    (PARTITION BY key ORDER BY order)``): one key-hash exchange co-locates
    each key's rows, one lexsort per partition orders them, and every
    lag/lead is a vectorized shift guarded at key boundaries (NULL outside
    the key's rows — exactly the SQL default). ``order_column`` must be
    unique within a key (an event id); int64 keys/orders."""
    import hashlib as _h

    from ..stages.exchange import hash_partition_exchange

    out_cols = [key, order_column, value_column]
    alias = [(f"lag_{n}", n) for n in lags] + [(f"lead_{n}", -n) for n in leads]

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(out_cols)
        if batch.num_rows == 0:
            return t.append_column("part", pa.array([], pa.int64()))
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        part = distinct_key_partition(k, num_partitions)
        return t.append_column("part", pa.array(part))

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                order_column: pa.array([], pa.int64()),
                value_column: pa.array([], pa.float64()),
                **{a: pa.array([], pa.float64()) for a, _ in alias},
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        o = group[order_column].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((o, k))
        ks, vs = k[order], v[order]
        n = len(ks)
        out = group.drop_columns(["part"]).take(pa.array(order))
        for name, shift in alias:
            col = np.full(n, np.nan)
            if shift > 0 and shift < n:  # lag
                col[shift:] = vs[:-shift]
                valid = np.zeros(n, dtype=bool)
                valid[shift:] = ks[shift:] == ks[:-shift]
            elif shift < 0 and -shift < n:  # lead
                m = -shift
                col[:-m] = vs[m:]
                valid = np.zeros(n, dtype=bool)
                valid[:-m] = ks[:-m] == ks[m:]
            else:
                valid = np.zeros(n, dtype=bool)
            out = out.append_column(
                name, pa.array(np.where(valid, col, np.nan), pa.float64(), mask=~valid)
            )
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(tagged, "part", num_partitions, fold)


def with_running_sum(
    ds: ray.data.Dataset,
    key: str,
    order_column: str,
    value_column: str,
    alias: str = "running_sum",
    round_to: int = 6,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-key running total (SQL ``sum(value) OVER (PARTITION BY key
    ORDER BY order ROWS UNBOUNDED PRECEDING)``): the same key-hash
    exchange + per-partition lexsort as the lag/lead kernel, with a
    boundary-reset cumulative sum (one subtraction of each key's prefix
    offset — fully vectorized)."""
    import hashlib as _h

    from ..stages.exchange import hash_partition_exchange

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([key, order_column, value_column])
        if batch.num_rows == 0:
            return t.append_column("part", pa.array([], pa.int64()))
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        part = distinct_key_partition(k, num_partitions)
        return t.append_column("part", pa.array(part))

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                order_column: pa.array([], pa.int64()),
                value_column: pa.array([], pa.float64()),
                alias: pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        o = group[order_column].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((o, k))
        ks, vs = k[order], v[order]
        # extended-precision global cumsum (same trick as range_join_agg)
        # so subtracting the key's prefix offset can't lose low bits to
        # cross-key cancellation before the per-key restart
        cs = np.cumsum(vs, dtype=np.longdouble)
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        # forward-fill each key's prefix offset explicitly (repeat by group
        # size) — maximum.accumulate would be wrong once negative values
        # make the global cumsum non-monotonic
        sizes = np.diff(np.r_[starts, len(ks)])
        base = np.repeat(np.r_[np.zeros(1, np.longdouble), cs[starts[1:] - 1]], sizes)
        run = (cs - base).astype(np.float64)
        out = group.drop_columns(["part"]).take(pa.array(order))
        return out.append_column(alias, pa.array(np.round(run, round_to)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(tagged, "part", num_partitions, fold)


def with_row_number(
    ds: ray.data.Dataset,
    key: str,
    order_column: str,
    descending: bool = False,
    alias: str = "rn",
    num_partitions: int = 16,
    ntile: int | None = None,
    ntile_alias: str = "tile",
) -> ray.data.Dataset:
    """Per-key ROW_NUMBER stamping over ALL rows (``row_number() OVER
    (PARTITION BY key ORDER BY order [DESC])`` — the stamp-everything
    sibling of ``grouped_top_k``'s pruned top-k): key-hash exchange, one
    lexsort per partition, vectorized group-start differencing.
    ``ntile=n`` additionally stamps SQL ``NTILE(n)`` buckets (the first
    ``size % n`` buckets take one extra row). ``order_column`` must be
    unique within a key."""
    import hashlib as _h

    from ..stages.exchange import hash_partition_exchange

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([key, order_column])
        if batch.num_rows == 0:
            return t.append_column("part", pa.array([], pa.int64()))
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        part = distinct_key_partition(k, num_partitions)
        return t.append_column("part", pa.array(part))

    def fold(group: pa.Table) -> pa.Table:
        cols = {
            key: pa.array([], pa.int64()),
            order_column: pa.array([], pa.int64()),
            alias: pa.array([], pa.int64()),
        }
        if ntile:
            cols[ntile_alias] = pa.array([], pa.int64())
        empty = pa.table(cols)
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        o = group[order_column].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((-o if descending else o, k))
        ks = k[order]
        n = len(ks)
        new = np.r_[True, ks[1:] != ks[:-1]]
        start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        rn = np.arange(n) - start + 1
        out = group.drop_columns(["part"]).take(pa.array(order))
        out = out.append_column(alias, pa.array(rn.astype(np.int64)))
        if ntile:
            # SQL NTILE: the first (size % ntile) buckets get one extra row
            starts = np.flatnonzero(new)
            sizes = np.diff(np.r_[starts, n])
            size_per_row = np.repeat(sizes, sizes)
            base = size_per_row // ntile
            extra = size_per_row % ntile
            idx0 = rn - 1
            cut = extra * (base + 1)
            tile = np.where(
                idx0 < cut,
                idx0 // np.maximum(base + 1, 1),
                extra + (idx0 - cut) // np.maximum(base, 1),
            ) + 1
            out = out.append_column(ntile_alias, pa.array(tile.astype(np.int64)))
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(tagged, "part", num_partitions, fold)


def sessionize(
    ds: ray.data.Dataset,
    ts_column: str = "ts",
    key_column: str = "user_id",
    gap_seconds: int = 1800,
    value_column: str | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Gap-based session windows: one output row per (key, session) with
    ``session_start`` / ``session_end`` / ``n_events`` [+ ``sum_value``] —
    a new session starts when a key's inter-event gap exceeds
    ``gap_seconds``.

    Ray Data has no session windowing; a ``groupby(key).map_groups`` would
    pay a sort-based shuffle (the repo's measured 24x-slower path), so this
    routes through the explicit hash exchange: events co-locate by
    ``hash(key)``, and one vectorized kernel per partition sorts (key, ts)
    once and derives session ids with a cumulative-sum over gap breaks —
    no per-row Python, no global sort. Partitioning assumption: a key's
    events fit one partition (same contract as any per-key window)."""
    from ..stages.exchange import hash_partition_exchange

    cols = [key_column, ts_column] + ([value_column] if value_column else [])

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        key = t[key_column].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (np.abs(key) % num_partitions).astype(np.int64)
        return t.append_column("part", pa.array(part))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def build_sessions(group: pa.Table) -> pa.Table:
        out_cols = {
            key_column: pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "session_end": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
        }
        if value_column:
            out_cols["sum_value"] = pa.array([], pa.float64())
        if group.num_rows == 0 or key_column not in group.column_names:
            return pa.table(out_cols)
        key = group[key_column].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group[ts_column].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts_us, key))
        k_s, t_s = key[order], ts_us[order]
        gap_us = np.int64(gap_seconds) * np.int64(1_000_000)
        brk = np.r_[True, (np.diff(k_s) != 0) | (np.diff(t_s) > gap_us)]
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(k_s)]
        n = (ends - starts).astype(np.int64)
        out = {
            key_column: k_s[starts],
            "session_start": t_s[starts].astype("datetime64[us]"),
            "session_end": t_s[ends - 1].astype("datetime64[us]"),
            "n_events": n,
        }
        if value_column:
            val = group[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
            out["sum_value"] = np.add.reduceat(val[order], starts)
        return pa.table(out)

    return hash_partition_exchange(tagged, "part", num_partitions, build_sessions)


def grouped_psi(
    ds: ray.data.Dataset,
    group_key: str,
    column: str,
    reference_group: str,
    bin_width: int,
    n_bins: int,
    eps: float = 1e-6,
    alias: str = "psi",
    round_to: int = 6,
    num_partitions: int = 8,
) -> pa.Table:
    """Population Stability Index of ``column``'s distribution per group
    vs a reference group — the drift-detection primitive between corpus
    cohorts (new crawl vs old, language vs language). Fixed-bin contract
    (``bin = min(floor(value / bin_width), n_bins - 1)``, negatives clamp
    to bin 0) so the whole computation is SQL-recomputable; proportions
    are smoothed with ``eps`` before the log so empty bins stay finite
    (the standard PSI guard, identical in the oracle).

    Scale shape: stateless binning, per-block (group, bin, count) integer
    partials, one key-hash exchange fold — only groups x n_bins integers
    ever reach the driver."""
    import hashlib as _h

    from ..stages.exchange import hash_partition_exchange

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.clip(v // bin_width, 0, n_bins - 1)
        g = np.array([str(x) for x in batch[group_key].to_pylist()], dtype=object)
        import pandas as pd

        codes, uniq = pd.factorize(g)
        combo = codes.astype(np.int64) * n_bins + b
        uc, cnt = np.unique(combo, return_counts=True)
        gs = uniq[(uc // n_bins).astype(np.int64)]
        part = np.fromiter(
            (
                int.from_bytes(_h.sha1(str(x).encode()).digest()[:8], "little")
                % num_partitions
                for x in gs
            ),
            np.int64,
            count=len(uc),
        )
        return pa.table(
            {
                "g": pa.array(gs.tolist(), pa.string()),
                "b": pa.array((uc % n_bins).astype(np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
                "part": pa.array(part),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "g" not in group.column_names:
            return empty
        g = np.array(group["g"].to_pylist(), dtype=object)
        b = group["b"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        import pandas as pd

        codes, uniq = pd.factorize(g)
        combo = codes.astype(np.int64) * n_bins + b
        uc, inv = np.unique(combo, return_inverse=True)
        acc = np.zeros(len(uc), np.int64)
        np.add.at(acc, inv, c)
        return pa.table(
            {
                "g": pa.array(uniq[(uc // n_bins).astype(np.int64)].tolist(), pa.string()),
                "b": pa.array((uc % n_bins).astype(np.int64)),
                "c": pa.array(acc),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    hist = hash_partition_exchange(pre, "part", num_partitions, fold).to_pandas()
    if hist.empty or reference_group not in set(hist["g"]):
        return pa.table(
            {group_key: pa.array([], pa.string()), alias: pa.array([], pa.float64())}
        )
    groups = sorted(set(hist["g"]))
    counts = {g: np.zeros(n_bins, np.float64) for g in groups}
    for g, b, c in zip(hist["g"], hist["b"], hist["c"]):
        counts[g][int(b)] = float(c)
    ref = counts[reference_group]
    p_ref = ref / ref.sum() + eps
    out_g, out_psi = [], []
    for g in groups:
        if g == reference_group:
            continue
        p = counts[g] / counts[g].sum() + eps
        psi = float(np.sum((p - p_ref) * np.log(p / p_ref)))
        out_g.append(g)
        out_psi.append(round(psi, round_to))
    return pa.table(
        {group_key: pa.array(out_g, pa.string()), alias: pa.array(out_psi, pa.float64())}
    )


def debounce_events(
    ds: ray.data.Dataset,
    user_column: str = "user_id",
    type_column: str = "event_type",
    ts_column: str = "ts",
    id_column: str = "event_id",
    window_seconds: int = 3600,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Windowed repeat suppression (alert/event debounce — the streaming
    dedup semantics): keep an event iff its (user, type) key has NO
    previous occurrence within ``window_seconds``. "Previous" is the
    immediately preceding event of the same key under (ts, id) order —
    SQL ``lag(ts) OVER (PARTITION BY user, type ORDER BY ts, id)`` with
    ``prev IS NULL OR ts - prev > window`` — the exactly-parallel,
    SQL-checkable variant. (Debouncing against the previous *kept*
    event is an inherently sequential per-key scan; this lag form is
    what stream processors implement for exactly this reason.)

    One user-hash exchange co-locates each user's rows; one C++
    multi-key sort + vectorized boundary/delta masks per partition.
    Returns the surviving rows as (id, user, type, ts)."""
    from ..stages.exchange import distinct_key_partition, hash_partition_exchange

    cols = [id_column, user_column, type_column, ts_column]
    win_us = np.int64(int(window_seconds) * 1_000_000)

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if batch.num_rows == 0:
            return t.append_column("part", pa.array([], pa.int64()))
        u = t[user_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "part", pa.array(distinct_key_partition(u, num_partitions))
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or id_column not in group.column_names:
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    user_column: pa.array([], pa.int64()),
                    type_column: pa.array([], pa.string()),
                    ts_column: pa.array([], pa.timestamp("us")),
                }
            )
        s = group.drop_columns(["part"]).sort_by(
            [
                (user_column, "ascending"),
                (type_column, "ascending"),
                (ts_column, "ascending"),
                (id_column, "ascending"),
            ]
        )
        u = s[user_column].to_numpy(zero_copy_only=False).astype(np.int64)
        tcodes = (
            s[type_column]
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
        )
        ts = s[ts_column].to_numpy(zero_copy_only=False).view("int64")
        new_key = np.r_[
            True, (u[1:] != u[:-1]) | (tcodes[1:] != tcodes[:-1])
        ]
        delta = np.empty(len(ts), np.int64)
        delta[0] = 0
        delta[1:] = ts[1:] - ts[:-1]
        keep = new_key | (delta > win_us)
        return s.filter(pa.array(keep))

    return hash_partition_exchange(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None),
        "part",
        num_partitions,
        fold,
    )


def grouped_mad_outliers(
    ds: ray.data.Dataset,
    key: str,
    id_column: str,
    value_column: str,
    k: float = 3.0,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Robust per-group outlier flags via median absolute deviation:
    ``is_outlier = |v - median(v)| > k * median(|v - median(v)|)`` — the
    outlier gate that, unlike the z-score, a few extreme values cannot
    drag (median and MAD have a 50% breakdown point).

    Exact medians need each group's values together: one key-hash
    exchange co-locates them (same per-group-fits-a-partition contract as
    ``grouped_quantiles``; groups here are low-cardinality categories).
    Both medians and the flags are computed vectorized per group with a
    loop over GROUPS only. IEEE-deterministic: median of doubles and the
    single multiply/compare reproduce bit-identically in SQL."""
    from ..stages.exchange import hash_partition_exchange as _hpe

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([key, id_column, value_column])
        if batch.num_rows == 0:
            return t.append_column("__mp", pa.array([], pa.int64()))
        kv = t[key].to_numpy(zero_copy_only=False)
        part = distinct_key_partition(kv, num_partitions)
        return t.append_column("__mp", pa.array(part))

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], pa.int64()),
                key: pa.array([], pa.string()),
                value_column: pa.array([], pa.float64()),
                "is_outlier": pa.array([], pa.bool_()),
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        kv = np.asarray(group[key].to_pylist(), object)
        ids = group[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, kidx = np.unique(kv, return_inverse=True)
        flags = np.zeros(len(v), bool)
        for gi in range(len(uniq)):
            m = kidx == gi
            med = np.median(v[m])
            ad = np.abs(v[m] - med)
            mad = np.median(ad)
            flags[m] = ad > k * mad
        return pa.table(
            {
                id_column: pa.array(ids),
                key: pa.array(kv.tolist(), pa.string()),
                value_column: pa.array(v),
                "is_outlier": pa.array(flags),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return _hpe(tagged, "__mp", num_partitions, fold)


def skew_report(
    ds: ray.data.Dataset,
    key: str,
    top_n: int = 20,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Hot-key diagnostic for choosing ``skew_salt`` before a big join or
    group-by: the exact top-``top_n`` heaviest keys with their row counts
    and share of the table, for ANY key type (int ids, url/domain
    strings, binary digests — the common skew cases). Blocks pre-reduce
    to one (key, cnt) row per block-distinct key; the key-hash exchange
    makes per-partition sums exact; each partition keeps its local top-n
    (the global top-n is a subset of the union) plus ONE total-row
    partial, so the driver folds P x (n + 1) rows."""
    key_type = ds.schema().base_schema.field(key).type

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], key_type),
                "cnt": pa.array([], pa.int64()),
                "__sp": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        enc = batch[key].combine_chunks().dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uk = enc.dictionary
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        part = distinct_key_partition(np.asarray(uk.to_pandas()), num_partitions)
        return pa.table(
            {key: uk.cast(key_type), "cnt": pa.array(cnt), "__sp": pa.array(part)}
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], key_type),
                "cnt": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
                "__pid": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        summed = (
            group.select([key, "cnt"])
            .group_by([key])
            .aggregate([("cnt", "sum")])
            .sort_by([("cnt_sum", "descending"), (key, "ascending")])
        )
        total = int(
            summed["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64).sum()
        )
        top = summed.slice(0, top_n)
        m = top.num_rows
        pid = int(group["__sp"][0].as_py())
        return pa.table(
            {
                key: top[key].combine_chunks().cast(key_type),
                "cnt": top["cnt_sum"].cast(pa.int64()),
                "total": pa.array(np.full(m, total, np.int64)),
                "__pid": pa.array(np.full(m, pid, np.int64)),
            }
        )

    from ..stages.exchange import hash_partition_exchange as _hpe

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    cands = _hpe(pre, "__sp", num_partitions, fold)

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], key_type),
                "cnt": pa.array([], pa.int64()),
                "share": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0 or key not in batch.column_names:
            return empty
        # ONE total per source partition (each of its rows repeats it)
        pid = batch["__pid"].to_numpy(zero_copy_only=False)
        tv = batch["total"].to_numpy(zero_copy_only=False)
        _, first = np.unique(pid, return_index=True)
        total = int(tv[first].sum())
        top = batch.sort_by(
            [("cnt", "descending"), (key, "ascending")]
        ).slice(0, top_n)
        c = top["cnt"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key: top[key].combine_chunks().cast(key_type),
                "cnt": top["cnt"].combine_chunks(),
                "share": pa.array(np.round(c / max(1, total), 6)),
            }
        )

    def retag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.append_column("__sp2", pa.array(np.zeros(n, np.int64)))

    tagged = cands.map_batches(retag, batch_format="pyarrow", batch_size=None)
    return _hpe(tagged, "__sp2", 1, final)


def grouped_gini(
    ds: ray.data.Dataset,
    key: str,
    value_column: str,
    alias: str = "gini",
    round_to: int = 6,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group Gini coefficient of a non-negative value column —
    the size-inequality statistic for corpus planning ("is this source a
    few huge documents or many small ones"): ``G = 2·Σ i·x(i) / (n·Σx)
    − (n+1)/n`` over each group's ascending-sorted values.

    Exactness: ties contribute the same Σ i·x under any ordering (equal
    x across the tied positions), so the statistic is computable from
    the (key, value, count) HISTOGRAM — blocks pre-aggregate to one row
    per distinct (key, value) per block, each key's histogram co-locates
    by key hash, and the integer rank-sums stay exact int64 until the
    two final double divisions (bit-identical in SQL)."""
    from ..stages.exchange import hash_partition_exchange

    key_type = ds.schema().base_schema.field(key).type

    def partial(batch: pa.Table) -> pa.Table:
        tbl = batch.select([key, value_column])
        out = tbl.group_by([key, value_column]).aggregate([(value_column, "count")])
        out = out.rename_columns([key, value_column, "__cnt"])
        kv = out[key].to_numpy(zero_copy_only=False)
        part = distinct_key_partition(kv, num_partitions)
        return out.append_column("part", pa.array(part))

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {key: pa.array([], key_type), alias: pa.array([], pa.float64())}
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        merged = (
            group.select([key, value_column, "__cnt"])
            .group_by([key, value_column])
            .aggregate([("__cnt", "sum")])
            .sort_by([(key, "ascending"), (value_column, "ascending")])
        )
        kv = np.asarray(merged[key].to_pandas(), dtype=object)
        v = merged[value_column].to_numpy(zero_copy_only=False).astype(np.int64)
        c = merged["__cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, kidx = np.unique(kv, return_inverse=True)
        # per-key cumulative count offsets (positions o+1 .. o+c per bin)
        starts = np.flatnonzero(np.r_[True, kidx[1:] != kidx[:-1]])
        sizes = np.diff(np.r_[starts, len(kidx)])
        gcs = np.cumsum(c)
        base = np.repeat(np.r_[np.int64(0), gcs[starts[1:] - 1]], sizes)
        o = gcs - c - base  # offset BEFORE this bin within its key
        n = np.bincount(kidx, weights=c, minlength=len(uniq)).astype(np.int64)
        # guard BEFORE forming any int64 product (ADVICE r4: the old n·Σx
        # check could evaluate on already-wrapped values). The bound is
        # computed per key in FLOAT64 — float products cannot wrap, and
        # their ~1e-16 relative error is irrelevant against the 2^52
        # threshold: per key, every int64 intermediate (each v·c, each
        # v·c·(2o+c+1) with o < n, and the bincount accumulations sx and
        # trs) is <= Σ|v|·c · (2n+1), so one data-dependent check covers
        # products AND float64-bincount exactness without rejecting large-
        # but-computable inputs the way a max|v|·n_max worst case would.
        vf = np.abs(v).astype(np.float64)
        sx_f = np.bincount(kidx, weights=vf * c, minlength=len(uniq))
        if len(n) and float((sx_f * (2.0 * n + 1.0)).max()) > 2**52:
            raise ValueError(
                "grouped_gini: sum|value|*(2n+1) exceeds the exact-integer "
                "bound (2^52) — rescale the value column first"
            )
        # Σ i·x over the bin = x · (c·(2o + c + 1) / 2); 2·Σ stays integer
        two_rank_sum = v * c * (2 * o + c + 1)
        sx = np.bincount(kidx, weights=v * c, minlength=len(uniq)).astype(np.int64)
        trs = np.bincount(
            kidx, weights=two_rank_sum, minlength=len(uniq)
        ).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            g = trs / (n.astype(np.float64) * sx) - (n + 1.0) / n
        g = np.where(sx > 0, g, 0.0)
        return pa.table(
            {
                key: pa.array(uniq.tolist(), key_type),
                alias: pa.array(np.round(g, round_to)),
            }
        )

    return hash_partition_exchange(pre, "part", num_partitions, fold)
