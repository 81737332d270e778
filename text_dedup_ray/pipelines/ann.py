"""Similarity search over an embedding column (``list<float>``).

Three paths (SURVEY/BASELINE "similarity search" requirement):

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  once with ``ray.put``; every batch does one numpy matmul against it and
  emits its LOCAL top-k per query (k rows per query per block — a partial
  top-k combiner), then a tiny driver-side merge takes the global top-k.
  Never materializes scores for the full dataset.
- ``lsh_bucket_topk``: the scale path — random-hyperplane (SimHash-for-
  vectors) bucket signatures; candidates share a bucket with the query in
  at least one of ``num_tables`` hash tables; exact re-rank of candidates.
- ``embedding_cosine_pairs``: EXACT threshold pair mining — blocked
  all-pairs cosine over materialized narrow blocks (one task per block
  pair). O(n^2/2) compute by definition; this is the exact/verification
  path (and the SQL-oracle-checkable one). Use the LSH dedup below when n
  makes all-pairs infeasible.

``embedding_cosine_dedup``: near-duplicate detection by embedding cosine >=
threshold via hyperplane-LSH bucketing + in-bucket verification + the shared
connected-components stage. Scale posture: the exchange ships each row's
bucket ids per table, but the embedding VECTOR goes out only once per
distinct (row, partition) — never once per table (fixed from round 1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str, dtype=np.float32) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    return flat.reshape(batch.num_rows, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    dtype=np.float32,
) -> pa.Table:
    """Exact top-k by cosine for each query row. Returns a small table
    (query_idx, vec_id, score) sorted by (query_idx, -score)."""
    qn = _normalize(np.asarray(queries, dtype=dtype))
    q_ref = ray.put(qn)

    class LocalTopK:
        def __init__(self, q_ref, k: int) -> None:
            self.q: np.ndarray = ray.get(q_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, embedding_column, dtype))
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            scores = self.q @ m.T  # (nq, nb)
            nq, nb = scores.shape
            kk = min(self.k, nb)
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(np.arange(nq, dtype=np.int64), kk)
            vi = top.reshape(-1)
            return pa.table(
                {
                    "query_idx": qi,
                    id_column: ids[vi],
                    "score": scores[np.arange(nq)[:, None], top].reshape(-1).astype(np.float64),
                }
            )

    partials = ds.map_batches(
        LocalTopK, fn_constructor_args=(q_ref, k), batch_format="pyarrow",
        concurrency=(1, 8),
    )
    merged = partials.to_pandas()  # k rows x queries x blocks — small
    merged = (
        merged.sort_values(["query_idx", "score", id_column], ascending=[True, False, True])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(merged, preserve_index=False)


def hyperplane_signatures(
    m: np.ndarray, planes: np.ndarray
) -> np.ndarray:
    """(n, dim) x (tables, bits, dim) -> (n, tables) uint64 bucket ids."""
    n = m.shape[0]
    tables = planes.shape[0]
    out = np.zeros((n, tables), dtype=np.uint64)
    for t in range(tables):
        bits = (m @ planes[t].T) > 0  # (n, bits)
        for b in range(planes.shape[1]):
            out[:, t] = (out[:, t] << np.uint64(1)) | bits[:, b].astype(np.uint64)
    return out


def lsh_bucket_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    num_tables: int = 8,
    num_bits: int = 12,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: candidates co-bucket with a query in >= 1 table,
    exact cosine re-rank of candidates only. Candidate matching is fully
    vectorized (sorted query signatures + searchsorted per table — no
    per-row Python, fixed from round 1)."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    dim = qn.shape[1]
    planes = np.random.RandomState(seed).randn(num_tables, num_bits, dim).astype(np.float32)
    q_sigs = hyperplane_signatures(qn, planes)  # (nq, tables)
    q_ref = ray.put((qn, planes, q_sigs))

    class BucketScan:
        def __init__(self, q_ref, k: int) -> None:
            self.q, self.planes, self.q_sigs = ray.get(q_ref)
            self.k = k
            # per table: query signatures sorted once for searchsorted lookup
            self.sorted_sigs: list[np.ndarray] = []
            self.sorted_qidx: list[np.ndarray] = []
            for t in range(self.q_sigs.shape[1]):
                order = np.argsort(self.q_sigs[:, t], kind="stable")
                self.sorted_sigs.append(self.q_sigs[order, t])
                self.sorted_qidx.append(order.astype(np.int64))

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, embedding_column))
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            sigs = hyperplane_signatures(m, self.planes)
            rows_all, qis_all = [], []
            for t in range(sigs.shape[1]):
                ss, sq = self.sorted_sigs[t], self.sorted_qidx[t]
                lo = np.searchsorted(ss, sigs[:, t], side="left")
                hi = np.searchsorted(ss, sigs[:, t], side="right")
                counts = hi - lo
                nz = np.flatnonzero(counts)
                if not len(nz):
                    continue
                rows_all.append(np.repeat(nz, counts[nz]))
                # flattened query positions for each matching row
                qis_all.append(
                    sq[
                        np.concatenate([np.arange(l, h) for l, h in zip(lo[nz], hi[nz])])
                    ]
                )
            if not rows_all:
                return pa.table(
                    {"query_idx": pa.array([], pa.int64()), id_column: pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )
            rows = np.concatenate(rows_all)
            qis = np.concatenate(qis_all)
            # dedup (row, query) pairs found by multiple tables
            pair_key = qis * np.int64(len(ids) + 1) + rows
            _, uniq = np.unique(pair_key, return_index=True)
            rows, qis = rows[uniq], qis[uniq]
            scores = np.einsum("ij,ij->i", m[rows], self.q[qis]).astype(np.float64)
            # local top-k per query: sort by (query, -score), take first k
            order = np.lexsort((-scores, qis))
            qs, rs, sc = qis[order], rows[order], scores[order]
            starts = np.flatnonzero(np.r_[True, np.diff(qs) != 0])
            rank = np.arange(len(qs)) - np.repeat(starts, np.diff(np.r_[starts, len(qs)]))
            keep = rank < self.k
            return pa.table(
                {
                    "query_idx": qs[keep],
                    id_column: ids[rs[keep]],
                    "score": sc[keep],
                }
            )

    partials = ds.map_batches(
        BucketScan, fn_constructor_args=(q_ref, k), batch_format="pyarrow",
        concurrency=(1, 8),
    )
    merged = partials.to_pandas()
    if len(merged) == 0:
        return pa.table(
            {"query_idx": pa.array([], pa.int64()), id_column: pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    merged = (
        merged.sort_values(["query_idx", "score", id_column], ascending=[True, False, True])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(merged, preserve_index=False)


def spherical_kmeans(
    sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Plain Lloyd iterations on normalized vectors (cosine geometry):
    centroids re-normalized each round, empty cells re-seeded from the
    worst-fit points. Pure numpy — the coarse quantizer for IVF."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    n = len(sample)
    k = min(n_cells, n)
    cents = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        sims = sample @ cents.T  # (n, k)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        new = np.zeros_like(cents)
        np.add.at(new, assign, sample)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():  # re-seed dead cells from the worst-fit points
            worst = np.argsort(best)[: int(empty.sum())]
            new[empty] = sample[worst]
            counts[empty] = 1
        cents = _normalize(new / counts[:, None])
    return cents


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    n_cells: int = 64,
    nprobe: int = 8,
    train_sample: int = 16384,
    kmeans_iters: int = 10,
    seed: int = 42,
    dtype=np.float32,
) -> pa.Table:
    """Approximate top-k via an IVF coarse quantizer (the classic ANN scale
    path next to ``lsh_bucket_topk``): spherical-k-means centroids trained on
    a driver-side sample, broadcast once; each batch assigns its rows to
    cells with one matmul and scores a row ONLY against queries probing that
    row's cell (``nprobe`` closest cells per query). Compute per batch drops
    from nq x nb to ~nq x nb x (nprobe / n_cells); the partial-top-k merge is
    identical to the brute-force path.

    At 10^12-row scale the training sample stays fixed-size (the quantizer
    needs distribution coverage, not corpus coverage) and the scan remains a
    single streaming pass — no cell-major re-layout is required, though one
    (repartition by cell) would additionally prune whole blocks."""
    qn = _normalize(np.asarray(queries, dtype=dtype))
    sample_tbl = (
        ds.select_columns([embedding_column]).limit(train_sample).to_arrow_refs()
    )
    parts = [t for t in map(ray.get, sample_tbl) if t.num_rows]
    if not parts:
        return pa.table(
            {"query_idx": pa.array([], pa.int64()), id_column: pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    sample = np.concatenate(
        [_batch_matrix(t, embedding_column, dtype) for t in parts], axis=0
    )
    cents = spherical_kmeans(sample, n_cells, iters=kmeans_iters, seed=seed)
    # per-query probe cells -> inverted (cell -> probing queries) index
    nprobe = min(nprobe, len(cents))
    probe = np.argpartition(-(qn @ cents.T), nprobe - 1, axis=1)[:, :nprobe]
    cell_of_pair = probe.reshape(-1)
    query_of_pair = np.repeat(np.arange(len(qn), dtype=np.int64), nprobe)
    order = np.argsort(cell_of_pair, kind="stable")
    cells_sorted = cell_of_pair[order]
    queries_sorted = query_of_pair[order]
    bounds = np.searchsorted(cells_sorted, np.arange(len(cents) + 1))
    state_ref = ray.put((qn, cents, queries_sorted, bounds))

    class CellScan:
        def __init__(self, state_ref, k: int) -> None:
            self.q, self.cents, self.qs_sorted, self.bounds = ray.get(state_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, embedding_column, dtype))
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            assign = np.argmax(m @ self.cents.T, axis=1)
            rows_all, qis_all, sc_all = [], [], []
            order = np.argsort(assign, kind="stable")
            cs = assign[order]
            starts = np.flatnonzero(np.r_[True, np.diff(cs) != 0])
            ends = np.r_[starts[1:], len(cs)]
            for s, e in zip(starts, ends):
                cell = int(cs[s])
                ql, qh = int(self.bounds[cell]), int(self.bounds[cell + 1])
                if qh == ql:
                    continue  # no query probes this cell
                ridx = order[s:e]
                qidx = self.qs_sorted[ql:qh]
                scores = m[ridx] @ self.q[qidx].T  # (rows_in_cell, probing_q)
                nr, nq = scores.shape
                kk = min(self.k, nr)
                top = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, nq)
                rows_all.append(ridx[top.reshape(-1)])
                qis_all.append(np.repeat(qidx[None, :], kk, axis=0).reshape(-1))
                sc_all.append(scores[top, np.arange(nq)[None, :]].reshape(-1))
            if not rows_all:
                return pa.table(
                    {"query_idx": pa.array([], pa.int64()),
                     id_column: pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "query_idx": np.concatenate(qis_all).astype(np.int64),
                    id_column: ids[np.concatenate(rows_all)],
                    "score": np.concatenate(sc_all).astype(np.float64),
                }
            )

    partials = ds.map_batches(
        CellScan, fn_constructor_args=(state_ref, k), batch_format="pyarrow",
        concurrency=(1, 8),
    )
    merged = partials.to_pandas()
    if len(merged) == 0:
        return pa.table(
            {"query_idx": pa.array([], pa.int64()), id_column: pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    merged = (
        merged.sort_values(["query_idx", "score", id_column], ascending=[True, False, True])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(merged, preserve_index=False)


def _mix_to_part(ids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Multiplicative hash of int64 ids -> [0, P) partition ids (uniform even
    for clustered/sequential id ranges)."""
    mixed = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
    return (mixed % np.uint64(num_partitions)).astype(np.int64)


def brute_force_topk_ds(
    ds: ray.data.Dataset,
    queries: ray.data.Dataset,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    query_id_column: str = "query_id",
    num_partitions: int = 32,
    dtype=np.float32,
    broadcast_limit: int = 1 << 30,
) -> ray.data.Dataset:
    """Exact cosine top-k with the QUERIES AS A DATASET (the many-queries
    path the driver-array APIs above don't cover — e.g. "for each new doc,
    find its nearest neighbors in the corpus").

    Plan: the narrow (query_id, embedding) projection is materialized into
    the object store and read ONCE PER ACTOR (`ray.put`-style broadcast —
    zero-copy shared per node); every corpus batch emits its local top-k per
    query; the partials are hash-partitioned BY QUERY ID through the
    explicit exchange and each partition takes its queries' global top-k —
    the merged result is a Dataset and never lands on the driver (unlike
    ``brute_force_topk``'s ``to_pandas`` merge, which is k x queries x
    blocks and driver-bound).

    Contract: the query matrix must fit in a worker's heap (checked against
    ``broadcast_limit`` bytes). For query sets beyond that, swap roles — the
    larger side should be ``ds``."""
    from ..stages.exchange import hash_partition_exchange

    q_narrow = queries.select_columns([query_id_column, embedding_column]).materialize()
    q_bytes = q_narrow.size_bytes() or 0
    if q_bytes > broadcast_limit:
        raise ValueError(
            f"query dataset is {q_bytes} bytes > broadcast_limit={broadcast_limit}; "
            "swap the roles of ds and queries (ds should be the larger side)"
        )
    q_refs = q_narrow.to_arrow_refs()

    def _empty() -> pa.Table:
        return pa.table(
            {
                query_id_column: pa.array([], pa.int64()),
                id_column: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )

    class DSLocalTopK:
        def __init__(self, q_refs, k: int) -> None:
            blocks = [t for t in ray.get(list(q_refs)) if t.num_rows]
            if blocks:
                self.qids = np.concatenate(
                    [b[query_id_column].to_numpy(zero_copy_only=False) for b in blocks]
                ).astype(np.int64)
                self.q = _normalize(
                    np.concatenate(
                        [_batch_matrix(b, embedding_column, dtype) for b in blocks]
                    )
                )
            else:
                self.qids = np.empty(0, np.int64)
                self.q = np.empty((0, 1), dtype)
            self.part = _mix_to_part(self.qids, num_partitions)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or not len(self.qids):
                e = _empty()
                return e.append_column("part", pa.array([], pa.int64()))
            m = _normalize(_batch_matrix(batch, embedding_column, dtype))
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            scores = self.q @ m.T  # (nq, nb)
            nq, nb = scores.shape
            kk = min(self.k, nb)
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(np.arange(nq, dtype=np.int64), kk)
            vi = top.reshape(-1)
            return pa.table(
                {
                    query_id_column: self.qids[qi],
                    id_column: ids[vi],
                    "score": scores[np.arange(nq)[:, None], top]
                    .reshape(-1)
                    .astype(np.float64),
                    "part": self.part[qi],
                }
            )

    partials = ds.map_batches(
        DSLocalTopK, fn_constructor_args=(q_refs, k), batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def merge_topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or query_id_column not in group.column_names:
            return _empty()
        qid = group[query_id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        vid = group[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = group["score"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vid, -sc, qid))
        qs = qid[order]
        starts = np.flatnonzero(np.r_[True, np.diff(qs) != 0])
        rank = np.arange(len(qs)) - np.repeat(starts, np.diff(np.r_[starts, len(qs)]))
        keep = rank < k
        return pa.table(
            {
                query_id_column: qs[keep],
                id_column: vid[order][keep],
                "score": sc[order][keep],
            }
        )

    return hash_partition_exchange(partials, "part", num_partitions, merge_topk)


def _empty_topk(query_id_column: str, id_column: str) -> pa.Table:
    return pa.table(
        {
            query_id_column: pa.array([], pa.int64()),
            id_column: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


def _make_merge_topk(query_id_column: str, id_column: str, k: int):
    """Per-partition global top-k over the exchanged partials (vectorized
    sort + rank; (score desc, id asc) tie-break, shared by the *_topk_ds
    APIs)."""

    def merge_topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or query_id_column not in group.column_names:
            return _empty_topk(query_id_column, id_column)
        qid = group[query_id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        vid = group[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = group["score"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vid, -sc, qid))
        qs = qid[order]
        starts = np.flatnonzero(np.r_[True, np.diff(qs) != 0])
        rank = np.arange(len(qs)) - np.repeat(starts, np.diff(np.r_[starts, len(qs)]))
        keep = rank < k
        return pa.table(
            {
                query_id_column: qs[keep],
                id_column: vid[order][keep],
                "score": sc[order][keep],
            }
        )

    return merge_topk


def ivf_topk_ds(
    ds: ray.data.Dataset,
    queries: ray.data.Dataset,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    query_id_column: str = "query_id",
    n_cells: int = 64,
    nprobe: int = 8,
    train_sample: int = 16384,
    kmeans_iters: int = 10,
    seed: int = 42,
    num_partitions: int = 32,
    dtype=np.float32,
    broadcast_limit: int = 1 << 30,
) -> ray.data.Dataset:
    """IVF top-k with the queries AS A DATASET — the scale path for
    many-queries similarity search: the brute ``brute_force_topk_ds`` scores
    every (row, query) pair; here rows score only against queries probing
    their cell (~nprobe/n_cells of the compute), and the partial top-k still
    merges through the hash exchange by query id (nothing driver-bound).
    Exhaustive (== brute) at nprobe == n_cells. Same broadcast contract for
    the query matrix as ``brute_force_topk_ds``."""
    from ..stages.exchange import hash_partition_exchange

    sample_tbl = (
        ds.select_columns([embedding_column]).limit(train_sample).to_arrow_refs()
    )
    parts = [t for t in map(ray.get, sample_tbl) if t.num_rows]
    if not parts:
        return ray.data.from_arrow(_empty_topk(query_id_column, id_column))
    sample = np.concatenate(
        [_batch_matrix(t, embedding_column, dtype) for t in parts], axis=0
    )
    cents = spherical_kmeans(sample, n_cells, iters=kmeans_iters, seed=seed)
    nprobe = min(nprobe, len(cents))

    q_narrow = queries.select_columns([query_id_column, embedding_column]).materialize()
    q_bytes = q_narrow.size_bytes() or 0
    if q_bytes > broadcast_limit:
        raise ValueError(
            f"query dataset is {q_bytes} bytes > broadcast_limit={broadcast_limit}; "
            "swap the roles of ds and queries (ds should be the larger side)"
        )
    q_refs = q_narrow.to_arrow_refs()
    cents_ref = ray.put(cents)

    class DSCellScan:
        def __init__(self, q_refs, cents_ref, k: int) -> None:
            self.cents: np.ndarray = ray.get(cents_ref)
            blocks = [t for t in ray.get(list(q_refs)) if t.num_rows]
            if blocks:
                self.qids = np.concatenate(
                    [b[query_id_column].to_numpy(zero_copy_only=False) for b in blocks]
                ).astype(np.int64)
                self.q = _normalize(
                    np.concatenate(
                        [_batch_matrix(b, embedding_column, dtype) for b in blocks]
                    )
                )
            else:
                self.qids = np.empty(0, np.int64)
                self.q = np.empty((0, 1), dtype)
            self.part = _mix_to_part(self.qids, num_partitions)
            # per-cell inverted probe index, built ONCE per actor
            if len(self.qids):
                probe = np.argpartition(
                    -(self.q @ self.cents.T), nprobe - 1, axis=1
                )[:, :nprobe]
                cell_of_pair = probe.reshape(-1)
                query_of_pair = np.repeat(
                    np.arange(len(self.qids), dtype=np.int64), nprobe
                )
                order = np.argsort(cell_of_pair, kind="stable")
                self.qs_sorted = query_of_pair[order]
                self.bounds = np.searchsorted(
                    cell_of_pair[order], np.arange(len(self.cents) + 1)
                )
            else:
                self.qs_sorted = np.empty(0, np.int64)
                self.bounds = np.zeros(len(self.cents) + 1, dtype=np.int64)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or not len(self.qids):
                return _empty_topk(query_id_column, id_column).append_column(
                    "part", pa.array([], pa.int64())
                )
            m = _normalize(_batch_matrix(batch, embedding_column, dtype))
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            assign = np.argmax(m @ self.cents.T, axis=1)
            rows_all, qis_all, sc_all = [], [], []
            order = np.argsort(assign, kind="stable")
            cs = assign[order]
            starts = np.flatnonzero(np.r_[True, np.diff(cs) != 0])
            ends = np.r_[starts[1:], len(cs)]
            for s, e in zip(starts, ends):
                cell = int(cs[s])
                ql, qh = int(self.bounds[cell]), int(self.bounds[cell + 1])
                if qh == ql:
                    continue
                ridx = order[s:e]
                qidx = self.qs_sorted[ql:qh]
                scores = m[ridx] @ self.q[qidx].T  # (rows_in_cell, probing_q)
                nr, nq = scores.shape
                kk = min(self.k, nr)
                top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
                rows_all.append(ridx[top.reshape(-1)])
                qis_all.append(np.repeat(qidx[None, :], kk, axis=0).reshape(-1))
                sc_all.append(scores[top, np.arange(nq)[None, :]].reshape(-1))
            if not rows_all:
                return _empty_topk(query_id_column, id_column).append_column(
                    "part", pa.array([], pa.int64())
                )
            qpos = np.concatenate(qis_all)
            return pa.table(
                {
                    query_id_column: self.qids[qpos],
                    id_column: ids[np.concatenate(rows_all)],
                    "score": np.concatenate(sc_all).astype(np.float64),
                    "part": self.part[qpos],
                }
            )

    partials = ds.map_batches(
        DSCellScan, fn_constructor_args=(q_refs, cents_ref, k),
        batch_format="pyarrow", concurrency=(1, 8),
    )
    return hash_partition_exchange(
        partials, "part", num_partitions,
        _make_merge_topk(query_id_column, id_column, k),
    )


def lsh_bucket_topk_ds(
    ds: ray.data.Dataset,
    queries: ray.data.Dataset,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    query_id_column: str = "query_id",
    num_tables: int = 8,
    num_bits: int = 12,
    seed: int = 42,
    num_partitions: int = 32,
    broadcast_limit: int = 1 << 30,
) -> ray.data.Dataset:
    """Hyperplane-LSH approximate top-k with queries AS A DATASET — the
    third member of the *_topk_ds trio (brute = exact, IVF = cell-pruned,
    LSH = bucket-pruned): candidates co-bucket with a query in >= 1 of
    ``num_tables`` tables, exact cosine re-rank of candidates only, partial
    top-k merged through the hash exchange by query id. Same broadcast
    contract for the query matrix as ``brute_force_topk_ds``; recall is
    probabilistic by design (pytest-asserted on planted data)."""
    from ..stages.exchange import hash_partition_exchange

    q_narrow = queries.select_columns([query_id_column, embedding_column]).materialize()
    q_bytes = q_narrow.size_bytes() or 0
    if q_bytes > broadcast_limit:
        raise ValueError(
            f"query dataset is {q_bytes} bytes > broadcast_limit={broadcast_limit}; "
            "swap the roles of ds and queries (ds should be the larger side)"
        )
    q_refs = q_narrow.to_arrow_refs()

    class DSBucketScan:
        def __init__(self, q_refs, k: int) -> None:
            blocks = [t for t in ray.get(list(q_refs)) if t.num_rows]
            if blocks:
                self.qids = np.concatenate(
                    [b[query_id_column].to_numpy(zero_copy_only=False) for b in blocks]
                ).astype(np.int64)
                self.q = _normalize(
                    np.concatenate(
                        [_batch_matrix(b, embedding_column, np.float32) for b in blocks]
                    )
                )
            else:
                self.qids = np.empty(0, np.int64)
                self.q = np.empty((0, 1), np.float32)
            self.part = _mix_to_part(self.qids, num_partitions)
            dim = self.q.shape[1] if len(self.qids) else 1
            self.planes = (
                np.random.RandomState(seed)
                .randn(num_tables, num_bits, dim)
                .astype(np.float32)
            )
            q_sigs = hyperplane_signatures(self.q, self.planes)
            self.sorted_sigs: list[np.ndarray] = []
            self.sorted_qidx: list[np.ndarray] = []
            for t in range(num_tables):
                order = np.argsort(q_sigs[:, t], kind="stable")
                self.sorted_sigs.append(q_sigs[order, t])
                self.sorted_qidx.append(order.astype(np.int64))
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or not len(self.qids):
                return _empty_topk(query_id_column, id_column).append_column(
                    "part", pa.array([], pa.int64())
                )
            m = _normalize(_batch_matrix(batch, embedding_column))
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            sigs = hyperplane_signatures(m, self.planes)
            rows_all, qis_all = [], []
            for t in range(sigs.shape[1]):
                ss, sq = self.sorted_sigs[t], self.sorted_qidx[t]
                lo = np.searchsorted(ss, sigs[:, t], side="left")
                hi = np.searchsorted(ss, sigs[:, t], side="right")
                counts = hi - lo
                nz = np.flatnonzero(counts)
                if not len(nz):
                    continue
                rows_all.append(np.repeat(nz, counts[nz]))
                qis_all.append(
                    sq[np.concatenate([np.arange(l, h) for l, h in zip(lo[nz], hi[nz])])]
                )
            if not rows_all:
                return _empty_topk(query_id_column, id_column).append_column(
                    "part", pa.array([], pa.int64())
                )
            rows = np.concatenate(rows_all)
            qis = np.concatenate(qis_all)
            pair_key = qis * np.int64(len(ids) + 1) + rows
            _, uniq = np.unique(pair_key, return_index=True)
            rows, qis = rows[uniq], qis[uniq]
            scores = np.einsum("ij,ij->i", m[rows], self.q[qis]).astype(np.float64)
            order = np.lexsort((-scores, qis))
            qs, rs, sc = qis[order], rows[order], scores[order]
            starts = np.flatnonzero(np.r_[True, np.diff(qs) != 0])
            rank = np.arange(len(qs)) - np.repeat(starts, np.diff(np.r_[starts, len(qs)]))
            keep = rank < self.k
            return pa.table(
                {
                    query_id_column: self.qids[qs[keep]],
                    id_column: ids[rs[keep]],
                    "score": sc[keep],
                    "part": self.part[qs[keep]],
                }
            )

    partials = ds.map_batches(
        DSBucketScan, fn_constructor_args=(q_refs, k), batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return hash_partition_exchange(
        partials, "part", num_partitions,
        _make_merge_topk(query_id_column, id_column, k),
    )


def first_occurrence_mask(part: np.ndarray) -> np.ndarray:
    """(n, tables) partition ids -> boolean mask of the FIRST occurrence of
    each distinct partition per row. The embedding vector is attached only to
    masked entries, so a row's vector enters the exchange at most
    min(num_tables, num_partitions) times and typically far fewer — never a
    flat x num_tables replication (round-1 finding #3)."""
    n, tables = part.shape
    dup = np.zeros((n, tables), dtype=bool)
    for t in range(1, tables):
        for u in range(t):
            dup[:, t] |= part[:, t] == part[:, u]
    return ~dup


def embedding_cosine_pairs(
    ds: ray.data.Dataset,
    threshold: float,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    dtype=np.float64,
) -> ray.data.Dataset:
    """EXACT cosine-threshold pair mining: (src, dst, cosine) with src > dst
    for every pair with cosine >= threshold.

    Blocked all-pairs: the narrow (id, embedding) projection is materialized
    into blocks; one Ray task per unordered block pair does a dense matmul.
    O(B^2) tasks / O(n^2) multiplications — the exact path for verification
    and oracle checks. Use ``embedding_cosine_dedup`` (LSH) at scale."""
    narrow = ds.select_columns([id_column, embedding_column]).materialize()
    block_refs = narrow.to_arrow_refs()

    @ray.remote
    def prep(block: pa.Table):
        if block.num_rows == 0:
            return (np.empty(0, dtype=np.int64), np.empty((0, 1), dtype=dtype))
        ids = block[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(block, embedding_column, dtype))
        return (ids, m)

    @ray.remote
    def cross(pa_i, pa_j, same: bool) -> pa.Table:
        ids_i, m_i = pa_i
        ids_j, m_j = pa_j
        if not len(ids_i) or not len(ids_j):
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        sims = m_i @ m_j.T
        if same:
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        else:
            ii, jj = np.nonzero(sims >= threshold)
        a, b = ids_i[ii], ids_j[jj]
        return pa.table(
            {
                "src": np.maximum(a, b).astype(np.int64),
                "dst": np.minimum(a, b).astype(np.int64),
                "cosine": sims[ii, jj].astype(np.float64),
            }
        )

    prepped = [prep.remote(r) for r in block_refs]
    outs = []
    for i in range(len(prepped)):
        for j in range(i, len(prepped)):
            outs.append(cross.remote(prepped[i], prepped[j], i == j))
    if not outs:
        return ray.data.from_arrow(
            pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        )
    return ray.data.from_arrow_refs(outs)


def embedding_cosine_dedup_exact(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    driver_threshold: int = 2_000_000,
):
    """Cluster map from EXACT cosine pairs (oracle-checkable). Dict below
    ``driver_threshold`` reduced edges, else a Dataset map."""
    from ..stages.cc import connected_components_auto

    pairs = embedding_cosine_pairs(ds, threshold, embedding_column, id_column)
    edges = pairs.map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    return connected_components_auto(edges, driver_threshold=driver_threshold)


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    num_tables: int = 8,
    num_bits: int = 10,
    seed: int = 42,
    merge_partitions: int = 32,
    driver_threshold: int = 2_000_000,
):
    """Embedding near-dup clusters: rows with cosine >= threshold connected.
    Returns a dict below ``driver_threshold`` reduced edges, else a Dataset
    map (automatic distributed-CC fallback).

    Hyperplane-LSH buckets generate candidates; each bucket's members are
    exactly re-ranked (pairwise cosine within bucket, vectorized); verified
    edges feed the shared tree-reduced union-find. Recall depends on
    (num_tables, num_bits) like any LSH — not exhaustive by design.

    Shuffle payload: bucket-id rows are narrow (row_id, table, bucket); the
    embedding vector is attached only to the FIRST bucket row per distinct
    (row, partition) — at most min(num_tables, merge_partitions) copies and
    typically far fewer, never a flat x num_tables replication."""
    from ..stages.cc import connected_components_auto
    from ..stages.exchange import hash_partition_exchange

    sig_stage = make_embedding_sig_stage(
        embedding_column, id_column, num_tables, num_bits, seed, merge_partitions
    )
    sig = ds.map_batches(sig_stage, batch_format="pyarrow")

    def per_partition(group: pa.Table) -> pa.Table:
        return embedding_partition_edges(group, threshold)

    edges = hash_partition_exchange(sig, "part", merge_partitions, per_partition)
    return connected_components_auto(edges, driver_threshold=driver_threshold)


def make_embedding_sig_stage(
    embedding_column: str,
    id_column: str,
    num_tables: int,
    num_bits: int,
    seed: int,
    merge_partitions: int,
):
    """The hyperplane-LSH signature kernel as a reusable map_batches closure
    (shared by the batch dedup above and the incremental index in
    pipelines/incremental_embedding.py — identical planes per seed, so
    bucket assignment is reproducible across runs)."""
    planes_holder = {}

    def sig_stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"row_id": pa.array([], pa.int64()),
                 "table_idx": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.uint64()),
                 "part": pa.array([], pa.int64()),
                 "vec": pa.array([], pa.list_(pa.float32()))}
            )
        m = _normalize(_batch_matrix(batch, embedding_column))
        if "planes" not in planes_holder:
            planes_holder["planes"] = (
                np.random.RandomState(seed).randn(num_tables, num_bits, m.shape[1]).astype(np.float32)
            )
        sigs = hyperplane_signatures(m, planes_holder["planes"])  # (n, tables)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.num_rows
        dim = m.shape[1]
        with np.errstate(over="ignore"):
            part = (
                (sigs * np.uint64(1000003) + np.arange(num_tables, dtype=np.uint64))
                % np.uint64(merge_partitions)
            ).astype(np.int64)
        # vec goes out once per distinct (row, part): mark later duplicates
        carry = first_occurrence_mask(part).reshape(-1)  # row-major (row, table)
        lengths = np.where(carry, dim, 0).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
        values = m[np.repeat(np.arange(n), num_tables)[carry]].reshape(-1).astype(np.float32)
        vec_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(values, pa.float32()),
            mask=pa.array(~carry),
        )
        return pa.table(
            {
                "row_id": np.repeat(ids, num_tables),
                "table_idx": np.tile(np.arange(num_tables, dtype=np.int32), n),
                "bucket": sigs.reshape(-1),
                "part": part.reshape(-1),
                "vec": vec_arr,
            }
        )

    return sig_stage


_EMPTY_EDGE_TABLE = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)


def embedding_partition_edges(
    group: pa.Table, threshold: float, n_old: int = 0
) -> pa.Table:
    """Verified cosine edges among same-(table, bucket) members of one
    exchange partition. ``n_old`` > 0 (the incremental path): the first
    ``n_old`` rows of ``group`` are the prior index — only (new x old) and
    (new x new) pairs are compared, since old-old connectivity is already
    folded into the prior cluster map (same argument as the SimHash
    incremental compare, stages/edges.simhash_distinct_sig_edges)."""
    if group.num_rows == 0:
        return _EMPTY_EDGE_TABLE
    ids = group["row_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = group["table_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = group["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    vec_col = group["vec"].combine_chunks()
    valid = ~np.asarray(vec_col.is_null())
    v_ids = ids[valid]
    flat = vec_col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    vmat = flat.reshape(len(v_ids), -1) if len(v_ids) else np.empty((0, 1), np.float32)
    # one vector per distinct row_id in this partition
    v_order = np.argsort(v_ids, kind="stable")
    v_ids_s = v_ids[v_order]
    first = np.r_[True, np.diff(v_ids_s) != 0]
    lookup_ids = v_ids_s[first]
    lookup_mat = vmat[v_order[first]]

    is_new = np.zeros(len(ids), dtype=bool)
    is_new[n_old:] = True

    order = np.lexsort((ids, b, t))
    ts, bs = t[order], b[order]
    starts = np.flatnonzero(np.r_[True, (np.diff(ts) != 0) | (np.diff(bs) != 0)])
    ends = np.r_[starts[1:], len(order)]
    src_out, dst_out = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        idx = order[s:e]
        if n_old:
            gnew = is_new[idx]
            if not gnew.any():
                continue  # pure-old bucket: edges already in the prior map
            idx = idx[np.argsort(gnew, kind="stable")]  # old first, new last
            g_old = int((~gnew).sum())
        else:
            g_old = 0
        mids = ids[idx]
        pos = np.searchsorted(lookup_ids, mids)
        mv = lookup_mat[pos]
        if g_old == 0 and n_old == 0:
            sims = mv @ mv.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        else:
            m = len(idx)
            new_mv = mv[g_old:]
            sims = new_mv @ mv.T  # (new, all)
            cols = np.arange(m)[None, :]
            rows = (g_old + np.arange(m - g_old))[:, None]
            allow = (cols < g_old) | (cols > rows)  # old cols always; new-new upper-tri
            ii, jj = np.nonzero((sims >= threshold) & allow)
            ii = ii + g_old
        if len(ii):
            a, c = mids[ii], mids[jj]
            src_out.append(np.maximum(a, c))
            dst_out.append(np.minimum(a, c))
    if not src_out:
        return _EMPTY_EDGE_TABLE
    return pa.table(
        {"src": np.concatenate(src_out).astype(np.int64),
         "dst": np.concatenate(dst_out).astype(np.int64)}
    )
