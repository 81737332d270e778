"""Table profiling: per-column null counts, EXACT distinct counts, and
numeric min/max in one narrow pass — the schema-health report a pipeline
runs before committing a multi-day job to a new input drop.

Scale shape: every block emits (a) one fixed-size stats partial per
column and (b) one (column, md5-16B value key) row per block-DISTINCT
value per column. The key stream co-locates by (column, key) hash so
per-partition distinct counts sum exactly (the same 128-bit-digest
birthday stance as exact dedup: a 64-bit key would expect silent
collisions at 10^12 rows); raw values never leave their block."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.exchange import hash_partition_exchange

_PART = "__pf_part"


def _value_keys(col: pa.ChunkedArray) -> list[bytes]:
    """md5-16B per DISTINCT non-null value of one column chunk — the md5
    loop is bounded by block-DISTINCT values (the lines.py contract),
    with batched value extraction (one to_pylist, no per-value as_py)."""
    arr = col.combine_chunks()
    valid = arr.drop_null()
    if len(valid) == 0:
        return []
    enc = valid.dictionary_encode()
    uniq = enc.dictionary
    typ = uniq.type
    if pa.types.is_floating(typ):
        raw = [v.hex() for v in uniq.to_pylist()]
    elif pa.types.is_timestamp(typ):
        raw = [str(v) for v in uniq.cast(pa.int64()).to_pylist()]
    else:
        raw = [str(v) for v in uniq.to_pylist()]
    return [hashlib.md5(s.encode()).digest() for s in raw]


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """One profile row per column: ``(column, n_rows, n_nulls,
    n_distinct, min_value, max_value)`` — min/max as doubles for numeric
    and timestamp (epoch-us) columns, NULL otherwise."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "column": pa.array([], pa.string()),
                "key": pa.array([], pa.binary(16)),
                "n": pa.array([], pa.int64()),
                "nulls": pa.array([], pa.int64()),
                "mn": pa.array([], pa.float64()),
                "mx": pa.array([], pa.float64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        tables = []
        for c in columns:
            col = batch[c]
            n = len(col)
            nn = col.null_count
            typ = col.type
            if pa.types.is_integer(typ) or pa.types.is_floating(typ):
                v = col.combine_chunks().drop_null()
                mn = pc.min(v).as_py() if len(v) else None
                mx = pc.max(v).as_py() if len(v) else None
            elif pa.types.is_timestamp(typ):
                v = col.combine_chunks().drop_null().cast(pa.int64())
                mn = pc.min(v).as_py() if len(v) else None
                mx = pc.max(v).as_py() if len(v) else None
            else:
                mn = mx = None
            # stats row: key NULL marks "this is the fixed-size partial"
            tables.append(
                pa.table(
                    {
                        "column": pa.array([c], pa.string()),
                        "key": pa.array([None], pa.binary(16)),
                        "n": pa.array([n], pa.int64()),
                        "nulls": pa.array([nn], pa.int64()),
                        "mn": pa.array(
                            [None if mn is None else float(mn)], pa.float64()
                        ),
                        "mx": pa.array(
                            [None if mx is None else float(mx)], pa.float64()
                        ),
                        _PART: pa.array([0], pa.int64()),
                    }
                )
            )
            # distinct-key rows: one md5 per block-DISTINCT value; constant
            # columns built as arrays, never per-value appends. Key rows
            # share partition 0 with the stats rows when P == 1.
            vk = _value_keys(col)
            if not vk:
                continue
            m = len(vk)
            prefixes = np.frombuffer(
                b"".join(d[:8] for d in vk), dtype=np.uint64
            )
            if num_partitions > 1:
                parts = (prefixes % np.uint64(num_partitions - 1)).astype(
                    np.int64
                ) + 1
            else:
                parts = np.zeros(m, np.int64)
            tables.append(
                pa.table(
                    {
                        "column": pa.array([c] * m, pa.string()),
                        "key": pa.array(vk, pa.binary(16)),
                        "n": pa.array(np.zeros(m, np.int64)),
                        "nulls": pa.array(np.zeros(m, np.int64)),
                        "mn": pa.array([None] * m, pa.float64()),
                        "mx": pa.array([None] * m, pa.float64()),
                        _PART: pa.array(parts),
                    }
                )
            )
        return pa.concat_tables(tables)

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "column": pa.array([], pa.string()),
                "n_rows": pa.array([], pa.int64()),
                "n_nulls": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "mn": pa.array([], pa.float64()),
                "mx": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or "column" not in group.column_names:
            return empty
        names = np.asarray(group["column"].to_pylist(), object)
        keys = group["key"].to_pylist()
        is_stat = np.array([k is None for k in keys], bool)
        out_names, out_n, out_nulls, out_d, out_mn, out_mx = [], [], [], [], [], []
        # stats partials (partition 0 only)
        if is_stat.any():
            st = group.filter(pa.array(is_stat))
            summed = st.group_by(["column"]).aggregate(
                [("n", "sum"), ("nulls", "sum"), ("mn", "min"), ("mx", "max")]
            )
            for i in range(summed.num_rows):
                out_names.append(summed["column"][i].as_py())
                out_n.append(summed["n_sum"][i].as_py())
                out_nulls.append(summed["nulls_sum"][i].as_py())
                out_d.append(0)
                out_mn.append(summed["mn_min"][i].as_py())
                out_mx.append(summed["mx_max"][i].as_py())
        # distinct-key rows: count distinct (column, key) in this partition
        # — vectorized over a (col_code, key_hi, key_lo) structured view
        if (~is_stat).any():
            kn = names[~is_stat]
            kv = [k for k, s in zip(keys, is_stat) if not s]
            cu, ccode = np.unique(kn, return_inverse=True)
            kb = np.frombuffer(b"".join(kv), dtype=np.uint64).reshape(-1, 2)
            trip = np.empty(
                (len(kv),), dtype=[("c", np.int64), ("h", np.uint64), ("l", np.uint64)]
            )
            trip["c"], trip["h"], trip["l"] = ccode, kb[:, 0], kb[:, 1]
            utrip = np.unique(trip)
            uc, cnt = np.unique(utrip["c"], return_counts=True)
            for c, k in zip(cu[uc], cnt):
                out_names.append(str(c))
                out_n.append(0)
                out_nulls.append(0)
                out_d.append(int(k))
                out_mn.append(None)
                out_mx.append(None)
        return pa.table(
            {
                "column": pa.array(out_names, pa.string()),
                "n_rows": pa.array(out_n, pa.int64()),
                "n_nulls": pa.array(out_nulls, pa.int64()),
                "n_distinct": pa.array(out_d, pa.int64()),
                "mn": pa.array(out_mn, pa.float64()),
                "mx": pa.array(out_mx, pa.float64()),
            }
        )

    def total(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "column": pa.array([], pa.string()),
                "n_rows": pa.array([], pa.int64()),
                "n_nulls": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "min_value": pa.array([], pa.float64()),
                "max_value": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0 or "column" not in group.column_names:
            return empty
        summed = group.group_by(["column"]).aggregate(
            [
                ("n_rows", "sum"),
                ("n_nulls", "sum"),
                ("n_distinct", "sum"),
                ("mn", "min"),
                ("mx", "max"),
            ]
        )
        return pa.table(
            {
                "column": summed["column"],
                "n_rows": summed["n_rows_sum"].cast(pa.int64()),
                "n_nulls": summed["n_nulls_sum"].cast(pa.int64()),
                "n_distinct": summed["n_distinct_sum"].cast(pa.int64()),
                "min_value": summed["mn_min"],
                "max_value": summed["mx_max"],
            }
        )

    def retag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(_PART, pa.array([], pa.int64()))
        return batch.append_column(
            _PART, pa.array(np.zeros(batch.num_rows, np.int64))
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    per_part = hash_partition_exchange(pre, _PART, num_partitions, fold)
    tagged = per_part.map_batches(retag, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(tagged, _PART, 1, total)
