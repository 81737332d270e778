"""Iterative graph computation on Ray Data: fixed-iteration PageRank as
synchronous message passing over the shared co-partition exchange.

The engine's connected-components (stages/cc.py) is the reachability
fold; this is the other classic graph shape — an ITERATIVE numeric
update where every round flows values along edges:

    r_{k+1}(v) = (1 - d) + d * sum over in-edges (u -> v) of r_k(u) / outdeg(u)

(the standard damped PageRank without dangling-mass redistribution —
nodes with no out-edges simply leak their mass, the common simplified
variant; nodes with no in-edges hold the teleport term. Fixed iteration
count, uniform r_0 = 1.)

Scale shape per iteration (no driver-resident state at any size):
1. ranks co-partition with edges by SOURCE hash (two-sided exchange);
   each partition maps its sources' ranks onto its edges and PRE-SUMS
   contributions per destination — the message volume leaving a
   partition is O(distinct dst touched), never O(edges);
2. contribution partials co-locate by DESTINATION hash together with
   the node table, so the update keeps zero-in-degree nodes alive.
Two narrow exchanges per iteration, edges themselves are partitioned
once and reused as a plain Dataset (lazy re-read per iteration keeps
the implementation simple; at real scale, materialize the partitioned
edge table once with .materialize()).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.exchange import (
    distinct_key_partition,
    hash_partition_exchange,
    two_sided_hash_exchange,
)

_PART = "__pr_part"


def _dedup_edges(
    edges: ray.data.Dataset, src: str, dst: str, num_partitions: int
) -> ray.data.Dataset:
    """DISTINCT (src, dst), co-located by src hash, with each source's
    outdegree stamped on every edge (outdeg rides along so iterations
    never need a second lookup)."""

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([src, dst])
        if batch.num_rows == 0:
            return t.append_column(_PART, pa.array([], pa.int64()))
        k = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            _PART, pa.array(distinct_key_partition(k, num_partitions))
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                src: pa.array([], pa.int64()),
                dst: pa.array([], pa.int64()),
                "outdeg": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or src not in group.column_names:
            return empty
        s = group[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = group[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([s, d], 1), axis=0)
        us, inv = np.unique(pairs[:, 0], return_inverse=True)
        deg = np.bincount(inv, minlength=len(us)).astype(np.int64)
        part = int(group[_PART][0].as_py())
        return pa.table(
            {
                src: pa.array(pairs[:, 0]),
                dst: pa.array(pairs[:, 1]),
                "outdeg": pa.array(deg[inv]),
                _PART: pa.array(np.full(len(pairs), part, np.int64)),
            }
        )

    tagged = edges.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(tagged, _PART, num_partitions, fold)


def pagerank(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    num_partitions: int = 16,
    round_to: int = 6,
    rank_alias: str = "rank",
) -> ray.data.Dataset:
    """Fixed-iteration damped PageRank over a directed edge Dataset ->
    (node, rank). See the module docstring for semantics and the
    per-iteration exchange shape."""
    dedup = _dedup_edges(edges, src, dst, num_partitions)

    # node table (src ∪ dst), partitioned by node hash — the base that
    # keeps zero-in-degree nodes alive through every update
    def node_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"node": pa.array([], pa.int64()), _PART: pa.array([], pa.int64())}
        )
        if batch.num_rows == 0 or src not in batch.column_names:
            return empty
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(np.concatenate([s, d]))
        return pa.table(
            {
                "node": pa.array(u),
                _PART: pa.array(distinct_key_partition(u, num_partitions)),
            }
        )

    def node_fold(group: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64())})
        if group.num_rows == 0 or "node" not in group.column_names:
            return empty
        u = np.unique(group["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u.astype(np.int64))})

    nodes = hash_partition_exchange(
        dedup.map_batches(node_partial, batch_format="pyarrow", batch_size=None),
        _PART,
        num_partitions,
        node_fold,
    )

    def init_ranks(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "r": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "node": batch["node"].combine_chunks(),
                "r": pa.array(np.ones(batch.num_rows)),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow", batch_size=None)

    def tag_by(col: str):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                cols = {c: batch[c] for c in batch.column_names if c != _PART}
                return pa.table(cols).append_column(
                    _PART, pa.array([], pa.int64())
                )
            k = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {c: batch[c].combine_chunks() for c in batch.column_names
                    if c != _PART}
            return pa.table(cols).append_column(
                _PART, pa.array(distinct_key_partition(k, num_partitions))
            )

        return f

    def contribute(rank_t, edge_t) -> pa.Table:
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "c": pa.array([], pa.float64())}
        )
        if rank_t is None or edge_t is None or "node" not in rank_t.column_names:
            return empty
        rn = rank_t["node"].to_numpy(zero_copy_only=False)
        rv = rank_t["r"].to_numpy(zero_copy_only=False)
        order = np.argsort(rn, kind="stable")
        rn, rv = rn[order], rv[order]
        es = edge_t[src].to_numpy(zero_copy_only=False)
        ed = edge_t[dst].to_numpy(zero_copy_only=False)
        deg = edge_t["outdeg"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(rn, es)
        ok = (pos < len(rn)) & (rn[np.minimum(pos, len(rn) - 1)] == es)
        contrib = rv[pos[ok]] / deg[ok]
        dsts = ed[ok]
        ud, inv = np.unique(dsts, return_inverse=True)
        sums = np.bincount(inv, weights=contrib, minlength=len(ud))
        return pa.table({"node": pa.array(ud.astype(np.int64)), "c": pa.array(sums)})

    def update(contrib_t, node_t) -> pa.Table:
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "r": pa.array([], pa.float64())}
        )
        if node_t is None or "node" not in node_t.column_names:
            return empty
        nn = np.unique(node_t["node"].to_numpy(zero_copy_only=False))
        total = np.zeros(len(nn))
        if contrib_t is not None and "node" in contrib_t.column_names:
            cn = contrib_t["node"].to_numpy(zero_copy_only=False)
            cv = contrib_t["c"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nn, cn)
            np.add.at(total, pos, cv)
        r = (1.0 - damping) + damping * total
        return pa.table({"node": pa.array(nn.astype(np.int64)), "r": pa.array(r)})

    for _ in range(iterations):
        rtag = ranks.map_batches(
            tag_by("node"), batch_format="pyarrow", batch_size=None
        )
        contribs = two_sided_hash_exchange(
            rtag, dedup, _PART, num_partitions, contribute
        )
        ctag = contribs.map_batches(
            tag_by("node"), batch_format="pyarrow", batch_size=None
        )
        ntag = nodes.map_batches(
            tag_by("node"), batch_format="pyarrow", batch_size=None
        )
        ranks = two_sided_hash_exchange(ctag, ntag, _PART, num_partitions, update)

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    rank_alias: pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "node": batch["node"].combine_chunks(),
                rank_alias: pa.array(
                    np.round(batch["r"].to_numpy(zero_copy_only=False), round_to)
                ),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow", batch_size=None)


def cooccurrence_top_pairs(
    ds: ray.data.Dataset,
    basket_column: str,
    item_column: str,
    top_n: int = 20,
    basket_cap: int = 10_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Market-basket co-occurrence: the exact top-``top_n`` item pairs by
    the number of baskets containing both (frequently-bought-together /
    co-citation). Classic self-join shape, kept scale-safe:

    1. (basket, item) rows co-locate by BASKET hash; each partition
       dedups items per basket and emits its C(k,2) pairs — ``basket_cap``
       drops ALL pairs from degenerate baskets larger than the cap, and
       the number of capped baskets is carried through the exchange and
       surfaced as a constant ``capped_baskets`` output column, so any
       divergence from an uncapped recomputation (e.g. the SQL oracle's
       ``0 AS capped_baskets``) is visible, never silent;
    2. pairs co-locate by PAIR hash, so per-partition counts are exact;
       each partition keeps its local top-n (the global top-n is a subset
       of the union) and the driver folds P x n candidate rows.

    Ordering contract: (count desc, a asc, b asc) — deterministic ties."""
    from ..stages.exchange import hash_partition_exchange

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([basket_column, item_column])
        if batch.num_rows == 0:
            return t.append_column(_PART, pa.array([], pa.int64()))
        k = t[basket_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            _PART, pa.array(distinct_key_partition(k, num_partitions))
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        # rows with capped > 0 are basket-cap counter rows, not pairs
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "capped": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or basket_column not in group.column_names:
            return empty
        bk = group[basket_column].to_numpy(zero_copy_only=False).astype(np.int64)
        it = group[item_column].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs_bi = np.unique(np.stack([bk, it], 1), axis=0)  # per-basket dedup
        bs, its = pairs_bi[:, 0], pairs_bi[:, 1]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        sizes = np.diff(np.r_[starts, len(bs)])
        n_capped = int((sizes > basket_cap).sum())
        out_a, out_b = [], []
        for s, n in zip(starts[(sizes > 1) & (sizes <= basket_cap)],
                        sizes[(sizes > 1) & (sizes <= basket_cap)]):
            mem = its[s : s + n]
            iu, ju = np.triu_indices(int(n), k=1)
            out_a.append(mem[iu])
            out_b.append(mem[ju])
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            pairs = np.stack([lo, hi], 1)
            uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
            part = (
                (uniq[:, 0].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + uniq[:, 1].astype(np.uint64))
                % np.uint64(num_partitions)
            ).astype(np.int64)
            ua, ub, uc = uniq[:, 0], uniq[:, 1], cnt.astype(np.int64)
        else:
            ua = ub = uc = np.array([], np.int64)
            part = np.array([], np.int64)
        if n_capped:
            ua = np.r_[ua, 0]
            ub = np.r_[ub, 0]
            uc = np.r_[uc, 0]
            part = np.r_[part, 0]  # all counter rows meet in partition 0
        capped = np.zeros(len(ua), np.int64)
        if n_capped:
            capped[-1] = n_capped
        return pa.table(
            {
                "a": pa.array(ua),
                "b": pa.array(ub),
                "cnt": pa.array(uc),
                "capped": pa.array(capped),
                _PART: pa.array(part),
            }
        )

    def local_top(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "capped": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "a" not in group.column_names:
            return empty
        cap_np = group["capped"].to_numpy(zero_copy_only=False)
        n_capped = int(cap_np.sum())
        pairs_only = group.filter(pa.array(cap_np == 0))
        summed = (
            pairs_only.select(["a", "b", "cnt"])
            .group_by(["a", "b"])
            .aggregate([("cnt", "sum")])
            .sort_by(
                [("cnt_sum", "descending"), ("a", "ascending"), ("b", "ascending")]
            )
            .slice(0, top_n)
        )
        a = summed["a"].to_numpy(zero_copy_only=False)
        b = summed["b"].to_numpy(zero_copy_only=False)
        c = summed["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        capped = np.zeros(len(a), np.int64)
        if n_capped:
            a, b, c = np.r_[a, 0], np.r_[b, 0], np.r_[c, 0]
            capped = np.r_[capped, n_capped]
        return pa.table(
            {
                "a": pa.array(a.astype(np.int64)),
                "b": pa.array(b.astype(np.int64)),
                "cnt": pa.array(c),
                "capped": pa.array(capped),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "capped_baskets": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "a" not in group.column_names:
            return empty
        cap_np = group["capped"].to_numpy(zero_copy_only=False)
        n_capped = int(cap_np.sum())
        top = (
            group.filter(pa.array(cap_np == 0))
            .select(["a", "b", "cnt"])
            .sort_by(
                [("cnt", "descending"), ("a", "ascending"), ("b", "ascending")]
            )
            .slice(0, top_n)
        )
        return top.append_column(
            "capped_baskets",
            pa.array(np.full(top.num_rows, n_capped, np.int64)),
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    raw_pairs = hash_partition_exchange(tagged, _PART, num_partitions, emit_pairs)
    cands = hash_partition_exchange(raw_pairs, _PART, num_partitions, local_top)

    def retag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _PART, pa.array(np.zeros(batch.num_rows, np.int64))
        )

    return hash_partition_exchange(
        cands.map_batches(retag, batch_format="pyarrow", batch_size=None),
        _PART,
        1,
        final,
    )
