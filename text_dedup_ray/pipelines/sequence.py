"""Event-sequence analytics: transition matrices, ordered funnels,
time-decayed aggregates, row-window moving averages, and rollup cubes.

These are the session/behavior-level query shapes a training-data or
telemetry pipeline runs next to dedup (the reference has no equivalent;
the SQL window/ROLLUP semantics are the contract, implemented on the
same key-hash exchange + per-partition lexsort kernel as
``agg.with_lag_lead`` / ``agg.with_running_sum``).

Scale shape shared by the per-key kernels: one hash exchange co-locates
each key's rows (narrow projected columns only), one vectorized lexsort
per partition orders them, and every output is either a stamped column
(window ops) or a fixed-cardinality partial (counts) — no driver-side
row loops, no all-to-all beyond the single keyed exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.exchange import distinct_key_partition, hash_partition_exchange

_PART = "__seq_part"


def _tag_by_key(ds: ray.data.Dataset, cols: list[str], key: str, num_partitions: int):
    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if batch.num_rows == 0:
            return t.append_column(_PART, pa.array([], pa.int64()))
        k = t[key].to_numpy(zero_copy_only=False)
        part = distinct_key_partition(k, num_partitions)
        return t.append_column(_PART, pa.array(part))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None)


def _drop_null_states(group: pa.Table, state_column: str) -> pa.Table:
    """NULL states never form transitions or funnel steps (same stance as
    editdist's "NULL text never pairs") — without this, a null dictionary
    index round-trips through float64 NaN to INT64_MIN and corrupts the
    fancy-indexed state codes."""
    if group.num_rows and state_column in group.column_names:
        col = group[state_column]
        if col.null_count:
            import pyarrow.compute as pc

            group = group.filter(pc.is_valid(col))
    return group


def _order_arrays(group: pa.Table, key: str, order_columns: tuple[str, ...]):
    """lexsort a co-located partition by (key, *order_columns)."""
    k = group[key].to_numpy(zero_copy_only=False)
    orders = [group[c].to_numpy(zero_copy_only=False) for c in order_columns]
    perm = np.lexsort(tuple(reversed(orders)) + (k,))
    return k[perm], perm


def transition_counts(
    ds: ray.data.Dataset,
    key: str,
    order_columns: tuple[str, ...],
    state_column: str,
    src_alias: str = "src",
    dst_alias: str = "dst",
    count_alias: str = "n",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """First-order Markov transition counts: for every key's event stream
    ordered by ``order_columns``, count consecutive ``(state -> next
    state)`` pairs corpus-wide (SQL: ``lead(state) OVER (PARTITION BY key
    ORDER BY ...)`` then ``GROUP BY src, dst``).

    NULL handling: rows with a NULL state are dropped up front (never
    form transitions) — equivalent to SQL with ``WHERE state IS NOT
    NULL`` before the window, so two states separated by a NULL DO pair.

    Scale shape: a key's rows co-locate once; each partition counts its
    transitions with factorize + bincount (one row per DISTINCT (src,
    dst) per partition — at most |states|^2); the final fold sums P tiny
    partials. Only (key, order, state) columns ever move."""

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                src_alias: pa.array([], pa.string()),
                dst_alias: pa.array([], pa.string()),
                count_alias: pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        group = _drop_null_states(group, state_column)
        if group.num_rows < 2 or key not in group.column_names:
            return empty
        ks, perm = _order_arrays(group, key, order_columns)
        enc = group[state_column].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[perm]
        states = np.asarray(enc.dictionary.to_pandas(), dtype=object)
        same = ks[1:] == ks[:-1]
        if not same.any():
            return empty
        n_s = len(states)
        combo = codes[:-1][same] * n_s + codes[1:][same]
        ucombo, cnt = np.unique(combo, return_counts=True)
        return pa.table(
            {
                src_alias: pa.array(states[ucombo // n_s], pa.string()),
                dst_alias: pa.array(states[ucombo % n_s], pa.string()),
                count_alias: pa.array(cnt.astype(np.int64)),
                _PART: pa.array(np.zeros(len(ucombo), np.int64)),
            }
        )

    def total(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                src_alias: pa.array([], pa.string()),
                dst_alias: pa.array([], pa.string()),
                count_alias: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or src_alias not in group.column_names:
            return empty
        summed = (
            group.select([src_alias, dst_alias, count_alias])
            .group_by([src_alias, dst_alias])
            .aggregate([(count_alias, "sum")])
        )
        return pa.table(
            {
                src_alias: summed[src_alias],
                dst_alias: summed[dst_alias],
                count_alias: summed[f"{count_alias}_sum"].cast(pa.int64()),
            }
        )

    cols = [key, *order_columns, state_column]
    tagged = _tag_by_key(ds, cols, key, num_partitions)
    partials = hash_partition_exchange(tagged, _PART, num_partitions, fold)
    return hash_partition_exchange(partials, _PART, 1, total)


def funnel_counts(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    state_column: str,
    steps: tuple[str, ...],
    tiebreak_column: str | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Ordered-funnel completion counts: for each prefix of ``steps``,
    how many keys performed those states in order (earliest-chaining:
    step i+1 must occur STRICTLY after the key's earliest valid step-i
    time — the standard ``min(ts) ... JOIN ... ts > prev`` SQL funnel).

    Scale shape: one keyed exchange; each partition chains its keys
    vectorized (``np.minimum.at`` per step over the factorized key
    index — |steps| passes, no per-key loop) and emits |steps| partial
    counts; the final fold sums P x |steps| integers."""
    order_cols = (ts_column,) + ((tiebreak_column,) if tiebreak_column else ())

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "step": pa.array([], pa.int64()),
                state_column: pa.array([], pa.string()),
                "n_keys": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        group = _drop_null_states(group, state_column)
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        ks, perm = _order_arrays(group, key, order_cols)
        tsv = group[ts_column].to_numpy(zero_copy_only=False)[perm]
        tsi = tsv.astype("datetime64[us]").astype(np.int64)
        sv = np.asarray(group[state_column].to_pandas(), dtype=object)[perm]
        _, kidx = np.unique(ks, return_inverse=True)
        n_keys = kidx.max() + 1
        prev = np.full(n_keys, np.iinfo(np.int64).min, np.int64)
        reached = np.ones(n_keys, bool)
        counts = []
        for s in steps:
            m = (sv == s) & reached[kidx] & (tsi > prev[kidx])
            cand = np.full(n_keys, np.iinfo(np.int64).max, np.int64)
            np.minimum.at(cand, kidx[m], tsi[m])
            reached &= cand < np.iinfo(np.int64).max
            prev = np.where(reached, cand, prev)
            counts.append(int(reached.sum()))
        return pa.table(
            {
                "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
                state_column: pa.array(list(steps), pa.string()),
                "n_keys": pa.array(np.asarray(counts, np.int64)),
                _PART: pa.array(np.zeros(len(steps), np.int64)),
            }
        )

    def total(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "step": pa.array([], pa.int64()),
                state_column: pa.array([], pa.string()),
                "n_keys": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "step" not in group.column_names:
            return empty
        summed = (
            group.select(["step", state_column, "n_keys"])
            .group_by(["step", state_column])
            .aggregate([("n_keys", "sum")])
        )
        s = summed.sort_by([("step", "ascending")])
        return pa.table(
            {
                "step": s["step"],
                state_column: s[state_column],
                "n_keys": s["n_keys_sum"].cast(pa.int64()),
            }
        )

    cols = [key, *order_cols, state_column]
    # order_cols may repeat ts; dedupe while preserving order
    cols = list(dict.fromkeys(cols))
    tagged = _tag_by_key(ds, cols, key, num_partitions)
    partials = hash_partition_exchange(tagged, _PART, num_partitions, fold)
    return hash_partition_exchange(partials, _PART, 1, total)


def decayed_sum(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    value_column: str,
    cutoff_us: int,
    half_life_s: float,
    alias: str = "decayed_value",
    round_to: int = 4,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-key exponentially time-decayed value sum at a cutoff instant:
    ``sum(value * 2^(-(cutoff - ts)/half_life))`` — the recency-weighted
    engagement/frequency score used for freshness-aware sampling.

    Scale shape: the weight is a stateless vectorized stamp; blocks
    pre-reduce to one (key, partial_sum) row per distinct key per block,
    so the exchange moves O(distinct keys) floats, never rows."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tsi = (
            batch[ts_column]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        v = batch[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        w = v * np.exp2(-(cutoff_us - tsi) / (half_life_s * 1e6))
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.bincount(inv, weights=w, minlength=len(uk))
        part = distinct_key_partition(uk, num_partitions)
        return pa.table(
            {
                key: pa.array(uk),
                "s": pa.array(sums),
                _PART: pa.array(part),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {key: pa.array([], pa.int64()), alias: pa.array([], pa.float64())}
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        s = group["s"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.bincount(inv, weights=s, minlength=len(uk))
        return pa.table(
            {key: pa.array(uk), alias: pa.array(np.round(sums, round_to))}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(pre, _PART, num_partitions, fold)


def moving_avg(
    ds: ray.data.Dataset,
    key: str,
    order_column: str,
    value_column: str,
    window_rows: int,
    alias: str = "moving_avg",
    round_to: int = 6,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-key row-window moving average (SQL ``avg(value) OVER
    (PARTITION BY key ORDER BY order ROWS BETWEEN window_rows-1 PRECEDING
    AND CURRENT ROW)``): the same exchange + lexsort as
    ``with_running_sum``, with the window sum taken as a difference of
    two extended-precision cumsum reads — O(n) per partition, no
    per-window loop."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")

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
        o = group[order_column].to_numpy(zero_copy_only=False)
        v = group[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        perm = np.lexsort((o, k))
        ks, vs = k[perm], v[perm]
        n = len(ks)
        cs = np.cumsum(vs, dtype=np.longdouble)
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        sizes = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, sizes)
        wlen = np.minimum(pos + 1, window_rows)
        lo = np.arange(n) - wlen + 1  # window start, always within the key
        base = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], np.longdouble(0))
        avg = ((cs - base) / wlen).astype(np.float64)
        out = group.drop_columns([_PART]).take(pa.array(perm))
        return out.append_column(alias, pa.array(np.round(avg, round_to)))

    tagged = _tag_by_key(ds, [key, order_column, value_column], key, num_partitions)
    return hash_partition_exchange(tagged, _PART, num_partitions, fold)


def rollup_counts(
    ds: ray.data.Dataset,
    dim_exprs: dict[str, "callable"],
    value_column: str,
    all_sentinel: str = "ALL",
    round_to: int = 3,
) -> ray.data.Dataset:
    """ROLLUP cube over two derived dimensions: count + value sum at the
    finest level plus every coarser prefix level, NULL-free (rollup rows
    carry the ``all_sentinel`` string instead of SQL's NULL so the output
    schema stays string-typed and unambiguous).

    ``dim_exprs`` maps output dim name -> fn(pa.Table) returning a
    string numpy array (the derived dimension per row).

    Scale shape: blocks pre-reduce to finest-level (d1, d2, n, sv)
    partials — rollup dimensions are low-cardinality by definition, so
    P x |d1 x d2| partial rows fold in ONE single-partition reduce that
    derives every coarser level by exact integer/float summation (a
    count/sum rollup is distributive: coarse = sum of fine)."""
    names = list(dim_exprs)
    if len(names) != 2:
        raise ValueError("rollup_counts supports exactly two dimensions")
    d1, d2 = names

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                d1: pa.array([], pa.string()),
                d2: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sv": pa.array([], pa.float64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        a = np.asarray(dim_exprs[d1](batch), dtype=object)
        b = np.asarray(dim_exprs[d2](batch), dtype=object)
        v = batch[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        ua, ia = np.unique(a, return_inverse=True)
        ub, ib = np.unique(b, return_inverse=True)
        combo = ia * len(ub) + ib
        uc, inv = np.unique(combo, return_inverse=True)
        n = np.bincount(inv, minlength=len(uc)).astype(np.int64)
        sv = np.bincount(inv, weights=v, minlength=len(uc))
        return pa.table(
            {
                d1: pa.array(ua[uc // len(ub)], pa.string()),
                d2: pa.array(ub[uc % len(ub)], pa.string()),
                "n": pa.array(n),
                "sv": pa.array(sv),
                _PART: pa.array(np.zeros(len(uc), np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                d1: pa.array([], pa.string()),
                d2: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or d1 not in group.column_names:
            return empty
        import pandas as pd

        df = group.select([d1, d2, "n", "sv"]).to_pandas()
        fine = df.groupby([d1, d2], as_index=False).sum()
        lvl1 = fine.groupby(d1, as_index=False)[["n", "sv"]].sum()
        lvl1[d2] = all_sentinel
        grand = pd.DataFrame(
            {d1: [all_sentinel], d2: [all_sentinel],
             "n": [fine["n"].sum()], "sv": [fine["sv"].sum()]}
        )
        out = pd.concat([fine, lvl1, grand], ignore_index=True)
        return pa.table(
            {
                d1: pa.array(out[d1].astype(str), pa.string()),
                d2: pa.array(out[d2].astype(str), pa.string()),
                "n": pa.array(out["n"].to_numpy(np.int64)),
                "sum_value": pa.array(np.round(out["sv"].to_numpy(np.float64), round_to)),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # single reducer is fine: partials are per-block rollup cells, bounded
    # by the dims' cardinality product (small by construction)
    return hash_partition_exchange(pre, _PART, 1, fold)


def cohort_retention(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Cohort-retention matrix: keys grouped by their FIRST-event day
    (the cohort), counted once per (cohort, day-offset) they were active
    on — the standard retention triangle.

    Scale shape: one keyed exchange co-locates each key's events; the
    partition derives the key's cohort day (vectorized per-key min) and
    its DISTINCT day offsets in one unique() pass, then emits partial
    (cohort, offset, n) counts — a key never needs a second exchange,
    and the final fold sums O(P x cohorts x offsets) integers."""
    _US_PER_DAY = 86_400_000_000

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.string()),
                "day_offset": pa.array([], pa.int64()),
                "n_keys": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        k = group[key].to_numpy(zero_copy_only=False)
        tsi = (
            group[ts_column]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        day = tsi // _US_PER_DAY
        uk, kidx = np.unique(k, return_inverse=True)
        cohort = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cohort, kidx, day)
        offset = day - cohort[kidx]
        # distinct (key, offset) -> then count keys per (cohort, offset)
        span = offset.max() + 1 if len(offset) else 1
        ku = np.unique(kidx * span + offset)
        co_k = (ku // span).astype(np.int64)
        co_off = (ku % span).astype(np.int64)
        combo = cohort[co_k] * span + co_off
        uc, cnt = np.unique(combo, return_counts=True)
        days = (uc // span).astype("datetime64[D]")
        return pa.table(
            {
                "cohort_day": pa.array(days.astype(str).tolist(), pa.string()),
                "day_offset": pa.array((uc % span).astype(np.int64)),
                "n_keys": pa.array(cnt.astype(np.int64)),
                _PART: pa.array(np.zeros(len(uc), np.int64)),
            }
        )

    def total(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.string()),
                "day_offset": pa.array([], pa.int64()),
                "n_keys": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "cohort_day" not in group.column_names:
            return empty
        summed = (
            group.select(["cohort_day", "day_offset", "n_keys"])
            .group_by(["cohort_day", "day_offset"])
            .aggregate([("n_keys", "sum")])
        )
        return pa.table(
            {
                "cohort_day": summed["cohort_day"],
                "day_offset": summed["day_offset"],
                "n_keys": summed["n_keys_sum"].cast(pa.int64()),
            }
        )

    tagged = _tag_by_key(ds, [key, ts_column], key, num_partitions)
    partials = hash_partition_exchange(tagged, _PART, num_partitions, fold)
    return hash_partition_exchange(partials, _PART, 1, total)


def inter_event_gaps(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    tiebreak_column: str,
    alias: str = "gap_us",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-key inter-event gaps in microseconds (SQL ``epoch_us(ts) -
    lag(epoch_us(ts)) OVER (PARTITION BY key ORDER BY ts, tiebreak)``,
    first event per key dropped): the keyed-exchange + lexsort kernel
    with one vectorized difference."""

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                alias: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        ks, perm = _order_arrays(group, key, (ts_column, tiebreak_column))
        tsi = (
            group[ts_column].to_numpy(zero_copy_only=False)[perm]
            .astype("datetime64[us]").astype(np.int64)
        )
        same = np.r_[False, ks[1:] == ks[:-1]]
        gaps = np.empty(len(tsi), np.int64)
        gaps[1:] = tsi[1:] - tsi[:-1]
        return pa.table(
            {
                key: pa.array(np.asarray(ks[same], np.int64)),
                alias: pa.array(gaps[same]),
            }
        )

    tagged = _tag_by_key(ds, [key, ts_column, tiebreak_column], key, num_partitions)
    return hash_partition_exchange(tagged, _PART, num_partitions, fold)


def last_seen(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    churn_cutoff_us: int | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Recency / churn report: every key's LAST event time, plus an
    ``is_churned`` flag when ``churn_cutoff_us`` is given (last seen
    strictly before the cutoff) — per-block (key, max ts) partials, one
    keyed exchange folds the exact max."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tsi = (
            batch[ts_column].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        uk, inv = np.unique(k, return_inverse=True)
        m = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(m, inv, tsi)
        return pa.table(
            {
                key: pa.array(uk),
                "m": pa.array(m),
                _PART: pa.array(distinct_key_partition(uk, num_partitions)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cols = {
            key: pa.array([], pa.int64()),
            "last_seen_us": pa.array([], pa.int64()),
        }
        if churn_cutoff_us is not None:
            cols["is_churned"] = pa.array([], pa.bool_())
        if group.num_rows == 0 or key not in group.column_names:
            return pa.table(cols)
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        m = group["m"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        mm = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mm, inv, m)
        out = {key: pa.array(uk), "last_seen_us": pa.array(mm)}
        if churn_cutoff_us is not None:
            out["is_churned"] = pa.array(mm < churn_cutoff_us)
        return pa.table(out)

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(pre, _PART, num_partitions, fold)


def funnel_durations(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    state_column: str,
    steps: tuple[str, ...],
    num_partitions: int = 16,
    alias: str = "duration_s",
) -> ray.data.Dataset:
    """Time-to-convert: for every key that completes the earliest-chained
    funnel (see :func:`funnel_counts`), the whole-funnel duration in
    seconds (last chained step time minus first step time). Same single
    keyed exchange and vectorized ``np.minimum.at`` chaining; emits one
    row per CONVERTED key."""

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                alias: pa.array([], pa.int64()),
            }
        )
        group = _drop_null_states(group, state_column)
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        k = group[key].to_numpy(zero_copy_only=False)
        tsi = (
            group[ts_column].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        sv = np.asarray(group[state_column].to_pandas(), dtype=object)
        uk, kidx = np.unique(k, return_inverse=True)
        n_keys = len(uk)
        prev = np.full(n_keys, np.iinfo(np.int64).min, np.int64)
        first = np.full(n_keys, 0, np.int64)
        reached = np.ones(n_keys, bool)
        for si, s in enumerate(steps):
            m = (sv == s) & reached[kidx] & (tsi > prev[kidx])
            cand = np.full(n_keys, np.iinfo(np.int64).max, np.int64)
            np.minimum.at(cand, kidx[m], tsi[m])
            reached &= cand < np.iinfo(np.int64).max
            prev = np.where(reached, cand, prev)
            if si == 0:
                first = np.where(reached, cand, first)
        dur = (prev - first) // 1_000_000
        return pa.table(
            {
                key: pa.array(np.asarray(uk[reached], np.int64)),
                alias: pa.array(dur[reached]),
            }
        )

    tagged = _tag_by_key(ds, [key, ts_column, state_column], key, num_partitions)
    return hash_partition_exchange(tagged, _PART, num_partitions, fold)


def peak_concurrency(
    intervals: ray.data.Dataset,
    start_column: str,
    end_column: str,
    num_partitions: int = 16,
    samples_per_block: int = 32,
) -> ray.data.Dataset:
    """Maximum number of simultaneously-open intervals (peak concurrent
    sessions) — the classic sweep-line, distributed: +1/-1 boundary
    points range-partition by time (sample-derived cuts), each partition
    computes its LOCAL prefix extremum and total delta, and the driver
    folds P (total, max) pairs — the global running sum never
    materializes. End-exclusive ties: a -1 at time t is processed before
    a +1 at t (an interval ending exactly when another starts does not
    overlap it)."""

    def points(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"t": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        s = (
            batch[start_column].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        e = (
            batch[end_column].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "t": pa.array(np.concatenate([s, e])),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
                    )
                ),
            }
        )

    pts = intervals.map_batches(points, batch_format="pyarrow", batch_size=None)

    # sample time keys -> range cuts (the pack.global_prefix_sum recipe)
    def sample(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        v = np.sort(batch["t"].to_numpy(zero_copy_only=False))
        step = max(1, len(v) // samples_per_block)
        return pa.table({"k": pa.array(v[::step][:samples_per_block])})

    pool_df = pts.map_batches(sample, batch_format="pyarrow", batch_size=None).to_pandas()
    if pool_df.empty:
        return ray.data.from_arrow(
            pa.table({"peak_concurrency": pa.array([0], pa.int64())})
        )
    pool = np.sort(pool_df["k"].to_numpy())
    cuts = np.unique(
        pool[np.linspace(0, len(pool) - 1, num_partitions + 1).astype(int)][1:-1]
    )
    n_parts = len(cuts) + 1

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(_PART, pa.array([], pa.int64()))
        t = batch["t"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            _PART, pa.array(np.searchsorted(cuts, t, "right").astype(np.int64))
        )

    def local(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pid": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "t" not in group.column_names:
            return empty
        t = group["t"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t))  # -1 before +1 at equal t
        cs = np.cumsum(d[order])
        pid = int(group[_PART][0].as_py())
        return pa.table(
            {
                "pid": pa.array([pid], pa.int64()),
                "total": pa.array([int(cs[-1])], pa.int64()),
                "mx": pa.array([int(cs.max())], pa.int64()),
            }
        )

    parts = hash_partition_exchange(
        pts.map_batches(stamp, batch_format="pyarrow", batch_size=None),
        _PART,
        n_parts,
        local,
    )

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "pid" not in batch.column_names:
            return pa.table({"peak_concurrency": pa.array([0], pa.int64())})
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        total = batch["total"].to_numpy(zero_copy_only=False)
        mx = batch["mx"].to_numpy(zero_copy_only=False)
        order = np.argsort(pid, kind="stable")
        base = np.concatenate(([0], np.cumsum(total[order])[:-1]))
        return pa.table(
            {
                "peak_concurrency": pa.array(
                    [int((base + mx[order]).max())], pa.int64()
                )
            }
        )

    def retag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__pc2", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    return hash_partition_exchange(
        parts.map_batches(retag, batch_format="pyarrow", batch_size=None),
        "__pc2",
        1,
        fold,
    )


def dense_hourly_counts(
    ds: ray.data.Dataset,
    ts_column: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Gap-filled hourly event counts: one row for EVERY hour between the
    corpus min and max timestamp, zero-count hours included — the dense
    calendar downstream time-series models require (a groupby alone
    silently drops empty buckets).

    Scale shape: blocks pre-reduce to (hour, n) partials; the fold
    receives only the distinct-hour histogram and densifies against the
    hour RANGE — calendar size is bounded by the time span (24*365 rows
    per year), never by data volume."""
    _US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        tsi = (
            batch[ts_column].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        h = tsi // _US
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uh),
                "n": pa.array(cnt.astype(np.int64)),
                _PART: pa.array(np.zeros(len(uh), np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "hour": pa.array([], pa.timestamp("us")),
                "n": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "h" not in group.column_names:
            return empty
        h = group["h"].to_numpy(zero_copy_only=False)
        c = group["n"].to_numpy(zero_copy_only=False)
        uh, inv = np.unique(h, return_inverse=True)
        sums = np.bincount(inv, weights=c, minlength=len(uh)).astype(np.int64)
        full = np.arange(uh[0], uh[-1] + 1, dtype=np.int64)
        dense = np.zeros(len(full), np.int64)
        dense[uh - uh[0]] = sums
        return pa.table(
            {
                "hour": pa.array((full * _US).astype("datetime64[us]")),
                "n": pa.array(dense),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # single reducer is fine: partials are per-block (hour, n) pairs bounded
    # by the calendar span (<= 8760 rows per block-year of 2 int64s)
    return hash_partition_exchange(pre, _PART, 1, fold)
