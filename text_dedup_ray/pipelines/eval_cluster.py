"""Distributed clustering-agreement evaluation: pair-counting Adjusted Rand
Index between two cluster-label columns over the same ids.

The reference evaluates dedup quality with sklearn's ``adjusted_rand_score``
on a driver-resident label vector (reference ``benchmarks/benchmark_news.py``
ARI eval, ``benchmarks/run_benchmark.py:84``); at 10^12 rows the labels never
fit one machine, so this computes the identical statistic distributively:

    contingency  n_ij = |{items with (label_a=i, label_b=j)}|
        via per-block pyarrow hash aggregation + ONE (a, b)-keyed groupby
        (grouped_sum_count — partial/combiner, never raw rows);
    component sums
        S_ab = sum_ij C(n_ij, 2)   S_a = sum_i C(a_i, 2)   S_b = sum_j C(b_j, 2)
        where a_i / b_j are contingency row/column sums — two more tiny
        groupbys over the contingency (bounded by distinct label PAIRS, not
        items), per-block partial comb2 sums, scalar Sum pulls;
    ARI  = (S_ab − S_a·S_b/C(n,2)) / ((S_a+S_b)/2 − S_a·S_b/C(n,2))
        with the sklearn conventions: denominator 0 → 1.0, n < 2 → 1.0.

Only scalars reach the driver. Component sums are exact int64 (the C(n,2)
bound means the statistic itself needs n ≲ 4·10^9 items per cluster before
int64 pair counts overflow — the same bound sklearn's int64 path has); the
final ARI is rounded to 6 decimals in BOTH engines (the rounded-ranking
trick) so libm ulp noise cannot flip the hash compare.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .agg import grouped_sum_count


def _comb2_partials(counts_ds: ray.data.Dataset, count_col: str) -> tuple[int, int]:
    """(Σ C(c,2), Σ c) over a count column, computed as per-block partials
    + Dataset Sum — two scalars cross the object store per block."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "__pairs": pa.array([int((c * (c - 1) // 2).sum())], pa.int64()),
                "__total": pa.array([int(c.sum())], pa.int64()),
            }
        )

    p = counts_ds.map_batches(partial, batch_format="pyarrow")
    pairs = p.sum("__pairs")
    total = p.sum("__total")
    return int(pairs or 0), int(total or 0)


def ari_components(
    labels: ray.data.Dataset,
    col_a: str = "label_a",
    col_b: str = "label_b",
) -> pa.Table:
    """Pair-counting ARI over ``labels(col_a, col_b)`` (one row per item).

    Returns a ONE-row Arrow table with the exact integer component sums
    (n_items, sum_pairs_ab, sum_pairs_a, sum_pairs_b) plus ``ari`` rounded
    to 6 decimals — the shape a SQL oracle can hash-match.
    """
    cont = grouped_sum_count(labels, [col_a, col_b], [], count_alias="nij").materialize()
    s_ab, n = _comb2_partials(cont, "nij")
    a_sums = grouped_sum_count(cont, [col_a], ["nij"], count_alias="__ncells")
    s_a, _ = _comb2_partials(a_sums, "nij")
    b_sums = grouped_sum_count(cont, [col_b], ["nij"], count_alias="__ncells")
    s_b, _ = _comb2_partials(b_sums, "nij")

    if n < 2:
        ari = 1.0
    else:
        c_n2 = n * (n - 1) // 2
        expected = (s_a / c_n2) * s_b  # float64, mirrored in the SQL oracle
        max_index = (s_a + s_b) / 2.0
        denom = max_index - expected
        ari = 1.0 if denom == 0.0 else (s_ab - expected) / denom
    return pa.table(
        {
            "n_items": pa.array([n], pa.int64()),
            "sum_pairs_ab": pa.array([s_ab], pa.int64()),
            "sum_pairs_a": pa.array([s_a], pa.int64()),
            "sum_pairs_b": pa.array([s_b], pa.int64()),
            "ari": pa.array([round(float(ari), 6)], pa.float64()),
        }
    )


def clustering_ari(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    id_column: str,
    label_a: str,
    label_b: str,
    num_partitions: int = 16,
) -> pa.Table:
    """ARI between two (id, label) cluster maps: ONE id-keyed inner hash
    join (both sides co-partition once — big-x-big safe) then the
    contingency machinery above. Items missing from either side drop, per
    the pair-counting definition over the common support."""
    from .joins import hash_join

    joined = hash_join(
        ds_a.select_columns([id_column, label_a]),
        ds_b.select_columns([id_column, label_b]),
        left_on=id_column,
        right_on=id_column,
        left_columns=[label_a],
        right_columns=[label_b],
        how="inner",
        num_partitions=num_partitions,
    )
    return ari_components(joined, label_a, label_b)


_COH_PART = "__coh_part"


def cluster_cohesion(
    assigned: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    cluster_column: str = "__CLUSTER__",
    ngram_size: int = 2,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-cluster cohesion audit over a near-dup cluster assignment: the
    micro-averaged pairwise shingle Jaccard of each non-singleton cluster,
    ``cohesion = sum_inter / sum_union`` over all member pairs. The curation
    question it answers: did the LSH threshold produce tight clusters
    (cohesion near 1 — safe to keep one representative) or did transitive
    chaining glue unrelated docs (cohesion near 0 — losing real data)?

    Exact integer identities (no pair enumeration anywhere):
      * a shingle shared by ``k`` members contributes ``C(k, 2)`` to
        ``sum_inter`` in O(1);
      * ``sum_union = (k_c - 1) * sum_sz - sum_inter`` because
        ``union(i,j) = sz_i + sz_j - inter(i,j)`` and each member appears
        in exactly ``k_c - 1`` pairs.
    The one division of two exact int64 sums is bit-identical across
    engines — the SQL oracle (oracles.cluster_cohesion_sql) hash-matches.

    Scale shape: pass 1 folds tiny per-block ``(cluster, count)`` partials
    through the hash exchange and broadcasts the NON-SINGLETON cluster ids
    (bounded by duplicate clusters, not corpus rows — the same driver-state
    contract as the dedup winner broadcasts); pass 2 ships one md5-16B key
    per member-distinct shingle co-partitioned by cluster (shingles of
    singleton docs — the vast majority at typical dup rates — never leave
    their block), and the per-partition fold is np.unique + np.add.at.

    Precondition: ``assigned`` comes from a dedup whose ``min_length >=
    ngram_size`` (true for every config in this repo), so the reference
    shingle contract's ``len(tokens) < n -> one whole-doc gram`` edge case
    cannot arise for a cluster member.
    """
    import hashlib

    import pyarrow.compute as pc  # noqa: F401  (kept for parity w/ siblings)

    from ..stages.edges import _binary_to_u8
    from ..stages.exchange import hash_partition_exchange
    from .corpus import _block_windows
    from .lines import _mix64

    def _part_of(cl: np.ndarray) -> pa.Array:
        return pa.array(
            (_mix64(cl) % np.uint64(num_partitions)).astype(np.int64), pa.int64()
        )

    labels = assigned.select_columns([cluster_column])

    def size_partial(t: pa.Table) -> pa.Table:
        c = t[cluster_column].to_numpy(zero_copy_only=False).astype(np.int64)
        u, n = np.unique(c, return_counts=True)
        return pa.table(
            {
                "cluster_id": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                _COH_PART: _part_of(u),
            }
        )

    def size_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty partitions arrive schemaless
            return pa.table({"cluster_id": pa.array([], pa.int64())})
        c = t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"cluster_id": pa.array(u[tot >= 2], pa.int64())})

    qual = hash_partition_exchange(
        labels.map_batches(size_partial, batch_format="pyarrow"),
        _COH_PART,
        num_partitions,
        size_reduce,
    )
    qdf = qual.to_pandas()
    # an all-singleton input can leave zero blocks -> a columnless frame
    qual_ids = (
        np.sort(qdf["cluster_id"].to_numpy().astype(np.int64))
        if len(qdf)
        else np.empty(0, np.int64)
    )
    qual_ref = ray.put(qual_ids)

    narrow = assigned.select_columns([id_column, cluster_column, text_column])
    empty_pairs = pa.table(
        {
            "cluster_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "key": pa.array([], pa.binary(16)),
            _COH_PART: pa.array([], pa.int64()),
        }
    )

    def gram_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_pairs
        qarr = ray.get(qual_ref)
        if not len(qarr):
            return empty_pairs
        cl = t[cluster_column].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(qarr, cl)
        inr = pos < len(qarr)
        m = np.zeros(len(cl), bool)
        m[inr] = qarr[pos[inr]] == cl[inr]
        if not m.any():
            return empty_pairs
        sub = t.filter(pa.array(m))
        w = _block_windows(sub, text_column, ngram_size)
        if w is None:
            return empty_pairs
        uniq_toks, uwin_codes, winv, doc_idx = w
        n_uwin = len(uwin_codes)
        upair = np.unique(doc_idx.astype(np.int64) * n_uwin + winv)
        d_idx = (upair // n_uwin).astype(np.int64)
        w_idx = (upair % n_uwin).astype(np.int64)
        # md5 only the block-distinct shingles (the lines.py contract)
        digests = np.empty(n_uwin, object)
        for i, row in enumerate(uwin_codes):
            digests[i] = hashlib.md5(
                " ".join(uniq_toks[c] for c in row).encode()
            ).digest()
        subcl = sub[cluster_column].to_numpy(zero_copy_only=False).astype(np.int64)
        subid = sub[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        out_cl = subcl[d_idx]
        return pa.table(
            {
                "cluster_id": pa.array(out_cl, pa.int64()),
                "doc_id": pa.array(subid[d_idx], pa.int64()),
                "key": pa.array(list(digests[w_idx]), pa.binary(16)),
                _COH_PART: _part_of(out_cl),
            }
        )

    empty_out = pa.table(
        {
            "cluster_id": pa.array([], pa.int64()),
            "n_members": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "sum_inter": pa.array([], pa.int64()),
            "sum_union": pa.array([], pa.int64()),
            "cohesion": pa.array([], pa.float64()),
        }
    )

    def cohesion_reduce(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty_out
        cl = np.ascontiguousarray(
            t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        doc = np.ascontiguousarray(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        u8 = _binary_to_u8(t["key"], 16, n).view(np.uint8).reshape(n, 16)
        # (cluster, shingle) multiplicity k -> C(k,2) intersection mass
        ck = np.empty((n, 24), np.uint8)
        ck[:, :8] = cl.view(np.uint8).reshape(n, 8)
        ck[:, 8:] = u8
        vv = np.ascontiguousarray(ck).view(np.dtype((np.void, 24))).ravel()
        _, gidx, gcnt = np.unique(vv, return_index=True, return_counts=True)
        gram_cl = cl[gidx]
        # (cluster, doc) -> member size
        cd = np.empty((n, 16), np.uint8)
        cd[:, :8] = cl.view(np.uint8).reshape(n, 8)
        cd[:, 8:] = doc.view(np.uint8).reshape(n, 8)
        dv = np.ascontiguousarray(cd).view(np.dtype((np.void, 16))).ravel()
        _, midx, sz = np.unique(dv, return_index=True, return_counts=True)
        mem_cl = cl[midx]
        uc, minv = np.unique(mem_cl, return_inverse=True)
        k = np.zeros(len(uc), np.int64)
        np.add.at(k, minv, 1)
        sum_sz = np.zeros(len(uc), np.int64)
        np.add.at(sum_sz, minv, sz.astype(np.int64))
        # align the gram fold onto the member fold's cluster order
        gpos = np.searchsorted(uc, gram_cl)
        sum_inter = np.zeros(len(uc), np.int64)
        np.add.at(sum_inter, gpos, (gcnt * (gcnt - 1) // 2).astype(np.int64))
        keep = k >= 2
        kk, ssz, si = k[keep], sum_sz[keep], sum_inter[keep]
        su = (kk - 1) * ssz - si
        return pa.table(
            {
                "cluster_id": pa.array(uc[keep], pa.int64()),
                "n_members": pa.array(kk, pa.int64()),
                "n_pairs": pa.array(kk * (kk - 1) // 2, pa.int64()),
                "sum_inter": pa.array(si, pa.int64()),
                "sum_union": pa.array(su, pa.int64()),
                "cohesion": pa.array(
                    si.astype(np.float64) / su.astype(np.float64), pa.float64()
                ),
            }
        )

    return hash_partition_exchange(
        narrow.map_batches(gram_partial, batch_format="pyarrow"),
        _COH_PART,
        num_partitions,
        cohesion_reduce,
    )


def bcubed_components(
    labels: ray.data.Dataset,
    col_a: str = "label_a",
    col_b: str = "label_b",
    num_partitions: int = 16,
) -> pa.Table:
    """B-cubed precision/recall/F1 of clustering A against reference B —
    the per-ITEM overlap average (Bagga & Baldwin), the standard
    entity-resolution companion to pair-counting ARI:

        precision = (1/N) Σ_cells nij² / a_i     (a_i = |cluster i in A|)
        recall    = (1/N) Σ_cells nij² / b_j

    Same distributed contingency as :func:`ari_components`; the per-cell
    division needs each cell's row/column total, joined back through the
    big-x-big hash join (cells are bounded by distinct label PAIRS). Only
    scalars reach the driver; round-6 on the three statistics."""
    from .joins import hash_join

    cont = grouped_sum_count(
        labels, [col_a, col_b], [], count_alias="nij"
    ).materialize()

    def side_sum(side_col: str) -> ray.data.Dataset:
        s = grouped_sum_count(cont, [side_col], ["nij"], count_alias="__nc")
        return s.map_batches(
            lambda t: pa.table(
                {side_col: t[side_col], "csz": t["nij"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )

    def ratio_sum(side_col: str) -> tuple[float, int]:
        joined = hash_join(
            cont,
            side_sum(side_col),
            side_col,
            side_col,
            ["nij"],
            ["csz"],
            how="inner",
            num_partitions=num_partitions,
        )

        def partial(t: pa.Table) -> pa.Table:
            nij = t["nij"].to_numpy(zero_copy_only=False).astype(np.float64)
            csz = t["csz"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {
                    "__rs": pa.array([float((nij * nij / csz).sum())]),
                    "__n": pa.array([int(nij.sum())], pa.int64()),
                }
            )

        p = joined.map_batches(partial, batch_format="pyarrow")
        return float(p.sum("__rs") or 0.0), int(p.sum("__n") or 0)

    ps, n = ratio_sum(col_a)
    rs, _ = ratio_sum(col_b)
    precision = ps / n if n else 1.0
    recall = rs / n if n else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return pa.table(
        {
            "n_items": pa.array([n], pa.int64()),
            "bcubed_precision": pa.array([round(precision, 6)], pa.float64()),
            "bcubed_recall": pa.array([round(recall, 6)], pa.float64()),
            "bcubed_f1": pa.array([round(f1, 6)], pa.float64()),
        }
    )
