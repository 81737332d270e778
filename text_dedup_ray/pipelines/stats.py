"""Moment-based statistics: A/B Welch test and grouped simple OLS.

Both reduce to per-block moment partials (n, Σx, Σy, Σxy, Σx², Σy²) —
fixed-size rows regardless of data volume, summed through one tiny
exchange; every derived statistic is a short deterministic double
expression over the folded moments, so a SQL oracle reproduces it to
rounding precision. (Float caveat: Σ of doubles is order-dependent at
the ~1e-13 relative level; the exposed statistics are means/ratios of
the sums, so rounding to 4-6 decimals absorbs it — same stance as the
pivot/window oracles.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.exchange import hash_partition_exchange

_PART = "__st_part"


def welch_ab_test(
    ds: ray.data.Dataset,
    variant_fn,
    value_column: str,
    round_to: int = 4,
) -> ray.data.Dataset:
    """Two-sample Welch t statistic between variant 0 and variant 1:
    ``t = (m0 - m1) / sqrt(s0²/n0 + s1²/n1)`` with sample variances —
    the A/B readout. ``variant_fn(batch) -> int64 numpy array in {0,1}``
    assigns rows to arms (deterministic hash assignments compose with
    ``sample.hash_split``). One moment partial per block per arm."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "v": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s1": pa.array([], pa.float64()),
                "s2": pa.array([], pa.float64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        var = np.asarray(variant_fn(batch), np.int64)
        y = batch[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        rows = []
        for v in (0, 1):
            m = var == v
            rows.append((v, int(m.sum()), float(y[m].sum()), float((y[m] ** 2).sum())))
        return pa.table(
            {
                "v": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "s1": pa.array([r[2] for r in rows], pa.float64()),
                "s2": pa.array([r[3] for r in rows], pa.float64()),
                _PART: pa.array([0, 0], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n0": pa.array([], pa.int64()),
                "n1": pa.array([], pa.int64()),
                "mean0": pa.array([], pa.float64()),
                "mean1": pa.array([], pa.float64()),
                "welch_t": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or "v" not in group.column_names:
            return empty
        v = group["v"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        s1 = group["s1"].to_numpy(zero_copy_only=False)
        s2 = group["s2"].to_numpy(zero_copy_only=False)
        stats = {}
        for arm in (0, 1):
            m = v == arm
            nn = int(n[m].sum())
            t1 = float(s1[m].sum())
            t2 = float(s2[m].sum())
            mean = t1 / nn if nn else 0.0
            var_s = (t2 - nn * mean * mean) / (nn - 1) if nn > 1 else 0.0
            stats[arm] = (nn, mean, var_s)
        n0, m0, v0 = stats[0]
        n1, m1, v1 = stats[1]
        denom = np.sqrt(v0 / n0 + v1 / n1) if n0 and n1 else 0.0
        t = (m0 - m1) / denom if denom else 0.0
        return pa.table(
            {
                "n0": pa.array([n0], pa.int64()),
                "n1": pa.array([n1], pa.int64()),
                "mean0": pa.array([round(m0, round_to)], pa.float64()),
                "mean1": pa.array([round(m1, round_to)], pa.float64()),
                "welch_t": pa.array([round(t, round_to)], pa.float64()),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # single reducer is fine: each block's partial is <= 2 cohort rows of 5
    # scalars, so the fold input is O(blocks) ~ tens of MB even at 10^6 blocks
    return hash_partition_exchange(pre, _PART, 1, fold)


def grouped_ols(
    ds: ray.data.Dataset,
    key: str,
    x_column: str,
    y_column: str,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Per-group simple linear regression y = a + b·x (OLS) with r²:
    SQL ``regr_slope / regr_intercept / regr_r2`` semantics from the five
    moment sums per (block, key) — fixed-size partials, one exchange."""
    key_type = ds.schema().base_schema.field(key).type

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], key_type),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.float64()),
                "sy": pa.array([], pa.float64()),
                "sxy": pa.array([], pa.float64()),
                "sxx": pa.array([], pa.float64()),
                "syy": pa.array([], pa.float64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        kv = batch[key].combine_chunks().dictionary_encode()
        kidx = kv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch[x_column].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_column].to_numpy(zero_copy_only=False).astype(np.float64)
        g = len(kv.dictionary)
        return pa.table(
            {
                key: kv.dictionary.cast(key_type),
                "n": pa.array(np.bincount(kidx, minlength=g).astype(np.int64)),
                "sx": pa.array(np.bincount(kidx, weights=x, minlength=g)),
                "sy": pa.array(np.bincount(kidx, weights=y, minlength=g)),
                "sxy": pa.array(np.bincount(kidx, weights=x * y, minlength=g)),
                "sxx": pa.array(np.bincount(kidx, weights=x * x, minlength=g)),
                "syy": pa.array(np.bincount(kidx, weights=y * y, minlength=g)),
                _PART: pa.array(np.zeros(g, np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], key_type),
                "slope": pa.array([], pa.float64()),
                "intercept": pa.array([], pa.float64()),
                "r2": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or key not in group.column_names:
            return empty
        summed = (
            group.select([key, "n", "sx", "sy", "sxy", "sxx", "syy"])
            .group_by([key])
            .aggregate(
                [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
            )
        )
        n = summed["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = summed["sx_sum"].to_numpy(zero_copy_only=False)
        sy = summed["sy_sum"].to_numpy(zero_copy_only=False)
        sxy = summed["sxy_sum"].to_numpy(zero_copy_only=False)
        sxx = summed["sxx_sum"].to_numpy(zero_copy_only=False)
        syy = summed["syy_sum"].to_numpy(zero_copy_only=False)
        cov = sxy - sx * sy / n
        varx = sxx - sx * sx / n
        vary = syy - sy * sy / n
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = cov / varx
            intercept = sy / n - slope * sx / n
            r2 = (cov * cov) / (varx * vary)
        ok = varx > 0
        # DuckDB regr_* degenerate semantics (the oracle this operator
        # hash-compares against): constant x (varx==0) -> NULL slope/
        # intercept/r2; constant y with varying x -> r2 = 1.0
        slope = np.where(ok, slope, 0.0)
        intercept = np.where(ok, intercept, 0.0)
        r2 = np.where(ok & (vary > 0), r2, np.where(ok, 1.0, 0.0))
        null_mask = ~ok
        return pa.table(
            {
                key: summed[key],
                "slope": pa.array(np.round(slope, round_to), mask=null_mask),
                "intercept": pa.array(np.round(intercept, round_to), mask=null_mask),
                "r2": pa.array(np.round(r2, round_to), mask=null_mask),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # single reducer is fine: partials are per-block per-key 8-scalar moment
    # rows, O(blocks x keys-per-block); for the low-cardinality keys this
    # operator targets (lang/source) that is O(blocks) scalars
    return hash_partition_exchange(pre, _PART, 1, fold)
