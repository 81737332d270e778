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
