"""Distributed joins Ray Data lacks natively: as-of join, range join, and a
generic broadcast hash join.

Ray Data has no join operator, and the naive route (groupby over a unioned
table, or a driver-side pandas merge) either pays a sort-based shuffle or
stops being distributed. These three cover the join shapes a training-data /
event-analytics pipeline actually needs:

- ``asof_join``: for each left row, the right row with the same key and the
  greatest right timestamp <= the left timestamp (backward as-of), with a
  deterministic tie-break column. Both sides co-partition by key hash
  through the explicit exchange (stages/exchange.two_sided_hash_exchange);
  one vectorized merged-lexsort kernel per partition — no per-row Python,
  no global sort.
- ``range_join_agg``: for each left row, COUNT(*) and optionally SUM(value)
  of right rows with the same key and a timestamp inside
  (left_ts + lo, left_ts + hi] (inclusivity configurable). Same exchange;
  the kernel answers every left row with two merged rank computations and a
  prefix-sum — O((L+R) log(L+R)) per partition regardless of match count.
- ``broadcast_join``: equi-join against a SMALL dimension side. The small
  side is collected, key-sorted and ``ray.put`` ONCE; every map task joins
  its batch via ``searchsorted`` against the worker-cached arrays — no
  shuffle of the big side at all (the broadcast-join rule from SURVEY §4).

Partitioning assumption for the exchange joins: one key's rows (both sides
combined) fit in one partition — the same contract as any per-key window.
Keys are int64; timestamps are cast to int64 microseconds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import two_sided_hash_exchange

_INT64_MAX = np.iinfo(np.int64).max


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp column -> int64 microseconds (vectorized, no Python rows)."""
    ts = col.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
    return ts.astype("datetime64[us]").astype(np.int64)


def _i64(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _tag_partition(ds: ray.data.Dataset, key: str, cols: list[str], num_partitions: int):
    """Project to ``cols`` and append ``part = abs(key) % P`` per batch."""

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        k = _i64(t[key])
        part = (np.abs(k) % num_partitions).astype(np.int64)
        return t.append_column("part", pa.array(part))

    return ds.map_batches(tag, batch_format="pyarrow")


def _empty_like(fields: list[tuple[str, pa.DataType]]) -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in fields})


def _rank_le_in_right(
    r_k: np.ndarray,
    r_t: np.ndarray,
    l_k: np.ndarray,
    l_t: np.ndarray,
    inclusive: bool,
) -> np.ndarray:
    """For each left (k, t): how many right rows have (key == k' < k) or
    (key == k and right_t <= t) — lexicographic rank of the probe among the
    right side sorted by (key, ts). ``inclusive=False`` counts strict
    ``right_t < t`` instead. One merged lexsort, fully vectorized.

    Ranks over SMALLER keys are included by construction; callers that
    difference two ranks (range windows) see those terms cancel, and as-of
    callers re-check the matched row's key."""
    n_r, n_l = len(r_k), len(l_k)
    all_k = np.concatenate([r_k, l_k])
    all_t = np.concatenate([r_t, l_t])
    # at equal (k, t): right sorts first for <= (left's rank counts it),
    # left sorts first for <
    side = np.concatenate(
        [np.full(n_r, 0 if inclusive else 1, np.int8), np.full(n_l, 1 if inclusive else 0, np.int8)]
    )
    order = np.lexsort((side, all_t, all_k))
    is_right = order < n_r
    cnt = np.cumsum(is_right)
    out = np.empty(n_l, dtype=np.int64)
    left_pos = np.flatnonzero(~is_right)
    # at a left element's merged position p, cnt[p] = rights at or before p,
    # and p itself is left -> rights strictly before
    out[order[left_pos] - n_r] = cnt[left_pos]
    return out


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    tie_column: str,
    left_columns: list[str],
    right_columns: list[str],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Backward as-of INNER join: for each left row, attach ``right_columns``
    from the right row with the same key and the greatest ``right_ts`` <=
    ``left_ts``; ties on the timestamp break to the greatest ``tie_column``
    (an int64 right column — required so results are deterministic when the
    right side has equal (key, ts) rows, which SQL ASOF leaves unspecified).
    Left rows with no match are dropped (inner semantics).

    Equivalent SQL (the oracle shape)::

        SELECT l.<left_columns>, r.<right_columns> FROM left l JOIN right r
        ON r.key = l.key AND r.ts <= l.ts
        QUALIFY row_number() OVER (PARTITION BY l.id
                                   ORDER BY r.ts DESC, r.tie DESC) = 1
    """
    assert not set(left_columns) & set(right_columns), "output columns must be disjoint"
    l_schema = left.schema()
    r_schema = right.schema()
    out_fields = [
        (c, l_schema.base_schema.field(c).type) for c in left_columns
    ] + [(c, r_schema.base_schema.field(c).type) for c in right_columns]

    l_cols = list(dict.fromkeys([left_key, left_ts] + left_columns))
    r_need = list(dict.fromkeys([right_key, right_ts, tie_column] + right_columns))
    lt_ds = _tag_partition(left, left_key, l_cols, num_partitions)
    rt_ds = _tag_partition(right, right_key, r_need, num_partitions)

    def reduce(lt: pa.Table | None, rt: pa.Table | None) -> pa.Table:
        if lt is None or rt is None or lt.num_rows == 0 or rt.num_rows == 0:
            return _empty_like(out_fields)
        l_k, l_t = _i64(lt[left_key]), _ts_us(lt[left_ts])
        r_k, r_t = _i64(rt[right_key]), _ts_us(rt[right_ts])
        r_tie = _i64(rt[tie_column])
        n_r, n_l = len(r_k), len(l_k)
        order_r = np.lexsort((r_tie, r_t, r_k))
        # merged rank over (key, ts, tie): the probe carries tie=+inf so at
        # equal (key, ts) it lands after every right row -> the match is the
        # max-(ts, tie) right row with ts <= probe ts
        all_k = np.concatenate([r_k, l_k])
        all_t = np.concatenate([r_t, l_t])
        all_tie = np.concatenate([r_tie, np.full(n_l, _INT64_MAX, np.int64)])
        side = np.concatenate([np.zeros(n_r, np.int8), np.ones(n_l, np.int8)])
        order = np.lexsort((side, all_tie, all_t, all_k))
        is_right = order < n_r
        cnt = np.cumsum(is_right)
        j = np.empty(n_l, dtype=np.int64)
        left_pos = np.flatnonzero(~is_right)
        j[order[left_pos] - n_r] = cnt[left_pos] - 1  # rank-1 = matched right row
        valid = j >= 0
        valid[valid] = r_k[order_r[j[valid]]] == l_k[valid]
        l_idx = np.flatnonzero(valid)
        r_idx = order_r[j[l_idx]]
        out = lt.select(left_columns).take(pa.array(l_idx))
        r_out = rt.select(right_columns).take(pa.array(r_idx))
        for c in right_columns:
            out = out.append_column(c, r_out[c])
        return out

    return two_sided_hash_exchange(lt_ds, rt_ds, "part", num_partitions, reduce)


def range_join_agg(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lo_us: int,
    hi_us: int,
    left_columns: list[str],
    value_column: str | None = None,
    lo_inclusive: bool = False,
    hi_inclusive: bool = True,
    count_alias: str = "n_matches",
    sum_alias: str = "sum_value",
    keep_unmatched: bool = False,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Windowed range join + aggregate: per left row, COUNT(*) (and
    SUM(value) when ``value_column`` is set) over right rows with the same
    key and ``right_ts`` in ``(left_ts + lo_us, left_ts + hi_us]`` (bound
    inclusivity configurable). ``keep_unmatched=False`` gives INNER-join
    group-by semantics (zero-match left rows dropped).

    The kernel never materializes matched pairs: two merged rank
    computations bound each left row's window inside the right side sorted
    by (key, ts), and an extended-precision prefix sum answers SUM — so a
    hot key with a dense window costs O((L+R) log) like everyone else,
    not O(matches)."""
    l_schema = left.schema()
    out_fields = [(c, l_schema.base_schema.field(c).type) for c in left_columns] + [
        (count_alias, pa.int64())
    ]
    if value_column:
        out_fields.append((sum_alias, pa.float64()))

    l_cols = list(dict.fromkeys([left_key, left_ts] + left_columns))
    r_cols = list(dict.fromkeys([right_key, right_ts] + ([value_column] if value_column else [])))
    lt_ds = _tag_partition(left, left_key, l_cols, num_partitions)
    rt_ds = _tag_partition(right, right_key, r_cols, num_partitions)

    def reduce(lt: pa.Table | None, rt: pa.Table | None) -> pa.Table:
        if lt is None or lt.num_rows == 0:
            return _empty_like(out_fields)
        n_l = lt.num_rows
        if rt is None or rt.num_rows == 0:
            if not keep_unmatched:
                return _empty_like(out_fields)
            out = lt.select(left_columns).append_column(
                count_alias, pa.array(np.zeros(n_l, np.int64))
            )
            if value_column:
                out = out.append_column(sum_alias, pa.array(np.zeros(n_l, np.float64)))
            return out
        l_k, l_t = _i64(lt[left_key]), _ts_us(lt[left_ts])
        r_k, r_t = _i64(rt[right_key]), _ts_us(rt[right_ts])
        order_r = np.lexsort((r_t, r_k))
        r_k_s, r_t_s = r_k[order_r], r_t[order_r]
        # rank of (k, lo] bound: exclusive lo counts right <= lo (to subtract),
        # inclusive lo counts right < lo
        cnt_lo = _rank_le_in_right(r_k_s, r_t_s, l_k, l_t + np.int64(lo_us), not lo_inclusive)
        cnt_hi = _rank_le_in_right(r_k_s, r_t_s, l_k, l_t + np.int64(hi_us), hi_inclusive)
        n = cnt_hi - cnt_lo  # smaller-key ranks cancel in the difference
        keep = np.ones(n_l, bool) if keep_unmatched else n > 0
        idx = np.flatnonzero(keep)
        out = lt.select(left_columns).take(pa.array(idx))
        out = out.append_column(count_alias, pa.array(n[idx]))
        if value_column:
            vals = rt[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
            pre = np.concatenate(
                [[np.longdouble(0)], np.cumsum(vals[order_r], dtype=np.longdouble)]
            )
            s = (pre[cnt_hi] - pre[cnt_lo]).astype(np.float64)
            out = out.append_column(sum_alias, pa.array(s[idx]))
        return out

    return two_sided_hash_exchange(lt_ds, rt_ds, "part", num_partitions, reduce)


_SMALL_SIDE_CACHE: dict[str, tuple[np.ndarray, pa.Table]] = {}


def _resolve_small(ref) -> tuple[np.ndarray, pa.Table]:
    key = str(ref)
    hit = _SMALL_SIDE_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _SMALL_SIDE_CACHE.clear()
        _SMALL_SIDE_CACHE[key] = hit
    return hit


def broadcast_join(
    ds: ray.data.Dataset,
    small: ray.data.Dataset | pa.Table,
    *,
    left_on: str,
    right_on: str,
    right_columns: list[str] | None = None,
    how: str = "inner",
    small_limit: int = 10_000_000,
) -> ray.data.Dataset:
    """Equi-join the big streaming side against a SMALL dimension side
    (``how`` in {'inner', 'left', 'semi', 'anti'}). The small side is
    collected to the driver once (guarded by ``small_limit``), key-sorted,
    ``ray.put`` once, and cached per worker — each batch joins via
    ``searchsorted``; the big side never shuffles. 'semi' keeps big-side
    rows whose key exists on the small side, 'anti' keeps the rest — both
    are pure filters (``right_columns`` unused). When the right side has
    duplicate keys the FIRST row per key (smallest ``right_on`` order
    position after the sort) wins — pre-aggregate the small side if other
    semantics are needed."""
    assert how in ("inner", "left", "semi", "anti")
    if how in ("inner", "left") and right_columns is None:
        raise ValueError(f"how={how!r} needs right_columns")
    right_columns = right_columns or []
    if isinstance(small, ray.data.Dataset):
        small_tbl = pa.concat_tables(
            [t for t in ray.get(small.to_arrow_refs()) if t.num_rows > 0]
        ) if small.count() > 0 else None
    else:
        small_tbl = small
    if small_tbl is None or small_tbl.num_rows == 0:
        keys = np.empty(0, np.int64)
        rt = None
    else:
        if small_tbl.num_rows > small_limit:
            raise ValueError(
                f"broadcast_join small side has {small_tbl.num_rows} rows > "
                f"small_limit={small_limit}; use an exchange join instead"
            )
        k = _i64(small_tbl[right_on])
        order = np.argsort(k, kind="stable")
        keys = k[order]
        rt = small_tbl.select(right_columns).take(pa.array(order))
        # first row per key wins deterministically
        first = np.concatenate([[True], keys[1:] != keys[:-1]])
        keys = keys[first]
        rt = rt.take(pa.array(np.flatnonzero(first)))
    ref = ray.put((keys, rt))

    def join(batch: pa.Table) -> pa.Table:
        skeys, srt = _resolve_small(ref)
        ids = _i64(batch[left_on])
        pos = np.searchsorted(skeys, ids)
        pos_c = np.clip(pos, 0, max(len(skeys) - 1, 0))
        hit = (skeys[pos_c] == ids) if len(skeys) else np.zeros(len(ids), bool)
        if how == "semi":
            return batch.filter(pa.array(hit))
        if how == "anti":
            return batch.filter(pa.array(~hit))
        if how == "inner":
            out = batch.filter(pa.array(hit))
            if srt is None:  # empty small side: 0 rows, types unknowable
                for c in right_columns:
                    out = out.append_column(c, pa.nulls(0))
                return out
            taken = srt.take(pa.array(pos_c[hit].astype(np.int64)))
            for c in right_columns:
                out = out.append_column(c, taken[c])
            return out
        # left join: null-fill misses via masked take indices
        out = batch
        if srt is None:
            for c in right_columns:
                out = out.append_column(c, pa.nulls(len(ids)))
            return out
        idx = pa.array(pos_c.astype(np.int64), mask=~hit)
        taken = srt.take(idx)
        for c in right_columns:
            out = out.append_column(c, taken[c])
        return out

    return ds.map_batches(join, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
    left_columns: list[str],
    right_columns: list[str],
    how: str = "inner",
    num_partitions: int = 16,
    right_suffix: str = "_r",
    skew_salt: int = 1,
) -> ray.data.Dataset:
    """Big-x-big equi-join — the general two-large-tables case the
    broadcast join can't serve (reference pipelines only ever join a
    driver-sized side; at 100 TB both sides of orders x lineitem are
    corpus-scale). Both sides co-partition ONCE by join-key hash through
    the shared two-sided exchange (each sub-table crosses the object
    store once, no sort-based shuffle) and every partition runs one
    vectorized sorted-probe kernel: right sorted by key, left probed with
    two searchsorted calls, match expansion by repeat arithmetic — no
    Python per-row work, O((L + R) log R) per partition regardless of
    match count. ``how`` = ``inner`` | ``left`` | ``right`` | ``full``:
    unmatched rows survive with NULLs on the other side, and the single
    output key column carries ``COALESCE(left key, right key)`` — SQL
    ``JOIN ... USING`` semantics. Right output columns colliding with
    left names get ``right_suffix``.

    Partitioning assumption (documented like the other exchange kernels):
    one join key's rows on each side fit in a partition. For skewed LEFT
    keys pass ``skew_salt=S > 1``: left rows scatter across S sub-keys
    (block-local round-robin — the output SET is unchanged) and each
    right row replicates into all S sub-keys, so a hot key's probe work
    spreads over S partitions at the cost of S x right volume. Salting is
    inner/left only (a replicated right row cannot detect
    "unmatched-everywhere" locally, so right/full reject it)."""
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(
            f"how must be inner|left|right|full|semi|anti, got {how!r}"
        )
    if skew_salt < 1:
        raise ValueError("skew_salt must be >= 1")
    if skew_salt > 1 and how in ("right", "full"):
        # left rows are never replicated, and with S <= P a left row's
        # partition holds exactly one copy of every right row sharing its
        # key — so inner/left/semi/anti all stay correct under salting;
        # only RIGHT-row unmatched detection (right/full) breaks
        raise ValueError("skew_salt requires how in inner|left|semi|anti")
    if skew_salt > num_partitions:
        # with S <= P, a key's S salts occupy S DISTINCT partitions, so a
        # probe never sees two replicas of the same right row (S > P would
        # alias salts into one partition and duplicate matches)
        raise ValueError("skew_salt must be <= num_partitions")
    if left_on not in left_columns:
        left_columns = [left_on, *left_columns]
    if right_on not in right_columns:
        right_columns = [right_on, *right_columns]

    if skew_salt == 1:
        l_tag = _tag_partition(left, left_on, left_columns, num_partitions)
        r_tag = _tag_partition(right, right_on, right_columns, num_partitions)
    else:
        S = skew_salt

        def tag_left(batch: pa.Table) -> pa.Table:
            t = batch.select(left_columns)
            k = np.abs(_i64(t[left_on])) % num_partitions
            salt = np.arange(len(k), dtype=np.int64) % S
            part = (k * S + salt) % num_partitions
            return t.append_column("part", pa.array(part))

        def tag_right(batch: pa.Table) -> pa.Table:
            t = batch.select(right_columns)
            n = t.num_rows
            rep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), S)))
            k = np.abs(_i64(rep[right_on])) % num_partitions
            salt = np.tile(np.arange(S, dtype=np.int64), n)
            part = (k * S + salt) % num_partitions
            return rep.append_column("part", pa.array(part))

        l_tag = left.map_batches(tag_left, batch_format="pyarrow")
        r_tag = right.map_batches(tag_right, batch_format="pyarrow")

    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    out_names: list[str] = list(left_columns)
    r_out_names: list[str] = []
    for c in right_columns:
        if c == right_on:
            continue  # equal to the left key by definition
        name = c if c not in out_names else c + right_suffix
        r_out_names.append(name)
        out_names.append(name)
    out_fields = [(n, l_schema.field(n).type) for n in left_columns] + [
        (n, r_schema.field(c).type)
        for n, c in zip(r_out_names, [c for c in right_columns if c != right_on])
    ]

    r_src_names = [c for c in right_columns if c != right_on]

    def right_only(rt: pa.Table, sel: np.ndarray | None = None) -> pa.Table:
        """Right rows with no left match: NULL left columns except the
        key, which carries the right key (USING / COALESCE semantics)."""
        r_sel = rt if sel is None else rt.take(pa.array(sel))
        cols: dict = {}
        key_type = dict(out_fields)[left_on]
        for n, typ in out_fields[: len(left_columns)]:
            cols[n] = (
                r_sel[right_on].cast(key_type)
                if n == left_on
                else pa.nulls(r_sel.num_rows, typ)
            )
        for name, c in zip(r_out_names, r_src_names):
            cols[name] = r_sel[c]
        return pa.table(cols)

    def join_partition(lt: pa.Table | None, rt: pa.Table | None) -> pa.Table:
        if lt is None or lt.num_rows == 0:
            if how in ("right", "full") and rt is not None and rt.num_rows:
                return right_only(rt)
            if how in ("semi", "anti"):
                return _empty_like(out_fields[: len(left_columns)])
            return _empty_like(out_fields)
        if rt is None or rt.num_rows == 0:
            if how in ("semi", "anti"):
                if how == "semi":
                    return _empty_like(out_fields[: len(left_columns)])
                return lt.drop_columns(["part"])
            if how in ("inner", "right"):
                return _empty_like(out_fields)
            out = lt.drop_columns(["part"])
            n = out.num_rows
            for name, (_, typ) in zip(r_out_names, out_fields[len(left_columns):]):
                out = out.append_column(name, pa.nulls(n, typ))
            return out.rename_columns(out_names)
        l_k = _i64(lt[left_on])
        r_k = _i64(rt[right_on])
        r_order = np.argsort(r_k, kind="stable")
        r_sorted = r_k[r_order]
        lo = np.searchsorted(r_sorted, l_k, side="left")
        hi = np.searchsorted(r_sorted, l_k, side="right")
        cnt = hi - lo
        if how in ("semi", "anti"):
            keep = cnt > 0 if how == "semi" else cnt == 0
            return lt.drop_columns(["part"]).filter(pa.array(keep))
        l_idx = np.repeat(np.arange(len(l_k)), cnt)
        total = int(cnt.sum())
        offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        r_pos = np.arange(total) - np.repeat(offs, cnt) + np.repeat(lo, cnt)
        r_idx = r_order[r_pos]
        l_out = lt.drop_columns(["part"]).take(pa.array(l_idx))
        cols = {n: l_out[n] for n in left_columns}
        r_taken = rt.take(pa.array(r_idx))
        for name, c in zip(r_out_names, [c for c in right_columns if c != right_on]):
            cols[name] = r_taken[c]
        matched = pa.table(cols)
        pieces = [matched]
        if how in ("left", "full"):
            miss = np.flatnonzero(cnt == 0)
            if len(miss):
                l_miss = lt.drop_columns(["part"]).take(pa.array(miss))
                mcols = {n: l_miss[n] for n in left_columns}
                for name, (_, typ) in zip(
                    r_out_names, out_fields[len(left_columns):]
                ):
                    mcols[name] = pa.nulls(len(miss), typ)
                pieces.append(pa.table(mcols))
        if how in ("right", "full"):
            hit_r = np.zeros(len(r_k), dtype=bool)
            hit_r[r_idx] = True
            r_miss = np.flatnonzero(~hit_r)
            if len(r_miss):
                pieces.append(right_only(rt, r_miss))
        if len(pieces) == 1:
            return matched
        return pa.concat_tables(pieces, promote_options="default")

    from ..stages.exchange import two_sided_hash_exchange

    return two_sided_hash_exchange(
        l_tag, r_tag, "part", num_partitions, join_partition
    )


def join_cardinality(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """EXACT equi-join cardinality WITHOUT running the join — the
    blow-up detector a planner consults before committing to a big
    shuffle: ``|A JOIN B|  =  sum over matched keys of cA(k) * cB(k)``,
    plus the matched-key count and each side's max per-key multiplicity
    (the skew signal).

    Scale shape: both sides pre-reduce to one (key, count) row per
    block-distinct key — only counts move, never rows; the two-sided
    key-hash exchange multiplies matched counts per partition and the
    driver folds P scalar partials."""
    from ..stages.exchange import two_sided_hash_exchange

    def side_partial(on: str):
        def f(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "__jc_part": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0:
                return empty
            k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
            uk, inv = np.unique(k, return_inverse=True)
            c = np.bincount(inv, minlength=len(uk)).astype(np.int64)
            return pa.table(
                {
                    "k": pa.array(uk),
                    "c": pa.array(c),
                    "__jc_part": pa.array(
                        (uk % num_partitions + num_partitions) % num_partitions
                    ),
                }
            )

        return f

    def reduce(lt, rt) -> pa.Table:
        empty = pa.table(
            {
                "est_rows": pa.array([], pa.int64()),
                "matched_keys": pa.array([], pa.int64()),
                "max_left": pa.array([], pa.int64()),
                "max_right": pa.array([], pa.int64()),
            }
        )
        if lt is None or rt is None or "k" not in lt.column_names:
            return empty
        lk = lt["k"].to_numpy(zero_copy_only=False)
        lc = lt["c"].to_numpy(zero_copy_only=False)
        rk = rt["k"].to_numpy(zero_copy_only=False)
        rc = rt["c"].to_numpy(zero_copy_only=False)
        # fold duplicate keys (multiple blocks contribute partials)
        ulk, linv = np.unique(lk, return_inverse=True)
        lsum = np.bincount(linv, weights=lc, minlength=len(ulk)).astype(np.int64)
        urk, rinv = np.unique(rk, return_inverse=True)
        rsum = np.bincount(rinv, weights=rc, minlength=len(urk)).astype(np.int64)
        li = np.searchsorted(urk, ulk)
        ok = (li < len(urk)) & (urk[np.minimum(li, len(urk) - 1)] == ulk)
        matched_l = lsum[ok]
        matched_r = rsum[li[ok]]
        return pa.table(
            {
                "est_rows": pa.array([int((matched_l * matched_r).sum())]),
                "matched_keys": pa.array([int(ok.sum())]),
                "max_left": pa.array(
                    [int(matched_l.max()) if len(matched_l) else 0]
                ),
                "max_right": pa.array(
                    [int(matched_r.max()) if len(matched_r) else 0]
                ),
            }
        )

    lp = left.map_batches(
        side_partial(left_on), batch_format="pyarrow", batch_size=None
    )
    rp = right.map_batches(
        side_partial(right_on), batch_format="pyarrow", batch_size=None
    )
    parts = two_sided_hash_exchange(lp, rp, "__jc_part", num_partitions, reduce)

    def total(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "est_rows" not in batch.column_names:
            # no matched keys anywhere: a well-typed zero row (the join
            # would produce 0 rows), never an empty schema-less result
            return pa.table(
                {
                    "est_rows": pa.array([0], pa.int64()),
                    "matched_keys": pa.array([0], pa.int64()),
                    "max_left": pa.array([0], pa.int64()),
                    "max_right": pa.array([0], pa.int64()),
                }
            )
        return pa.table(
            {
                "est_rows": pa.array(
                    [int(batch["est_rows"].to_numpy(zero_copy_only=False).sum())]
                ),
                "matched_keys": pa.array(
                    [int(batch["matched_keys"].to_numpy(zero_copy_only=False).sum())]
                ),
                "max_left": pa.array(
                    [int(batch["max_left"].to_numpy(zero_copy_only=False).max())]
                ),
                "max_right": pa.array(
                    [int(batch["max_right"].to_numpy(zero_copy_only=False).max())]
                ),
            }
        )

    from ..stages.exchange import hash_partition_exchange

    def retag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__jc2", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    return hash_partition_exchange(
        parts.map_batches(retag, batch_format="pyarrow", batch_size=None),
        "__jc2",
        1,
        total,
    )
