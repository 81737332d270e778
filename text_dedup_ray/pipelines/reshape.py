"""Reshape operators: pivot (long -> wide) and unpivot/melt (wide -> long).

Both are expressed Ray-Data-first:

- ``pivot_table`` widens INSIDE each block (a dense per-block
  keys x pivot-values count/sum matrix via factorize + ``np.add.at``), so
  only pre-aggregated wide partials — O(distinct keys per block x V)
  rows — reach the one ``groupby(key).aggregate(Sum...)`` shuffle. Raw
  rows never shuffle. Pivot cardinality V is a broadcast-sized constant by
  definition of a pivot; discovery is a per-block ``unique`` fold and the
  op refuses to widen past ``max_pivot_values`` instead of silently
  exploding the schema.
- ``unpivot`` is a stateless per-block transform (no shuffle at all).

The TPC-H-ish gate exercises both over ``events`` with a DuckDB
``PIVOT ... USING count(*)`` / ``UNION ALL`` oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum


def _discover_pivot_values(
    ds: ray.data.Dataset, pivot_column: str, max_pivot_values: int
) -> list:
    """Distinct pivot values via per-block ``unique`` partials folded on the
    driver — the fold sees O(blocks x V) rows, never the corpus."""

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({pivot_column: pc.unique(t[pivot_column])})

    parts = ds.select_columns([pivot_column]).map_batches(
        uniq, batch_format="pyarrow", batch_size=None
    )
    vals: set = set()
    for batch in parts.iter_batches(batch_format="pyarrow"):
        vals.update(v for v in batch[pivot_column].to_pylist() if v is not None)
        if len(vals) > max_pivot_values:
            raise ValueError(
                f"pivot_table: >{max_pivot_values} distinct values in "
                f"'{pivot_column}' — a pivot this wide is a schema explosion; "
                "pass pivot_values explicitly or raise max_pivot_values"
            )
    return sorted(vals, key=str)


def pivot_table(
    ds: ray.data.Dataset,
    key_column: str,
    pivot_column: str,
    value_column: str | None = None,
    pivot_values: list | None = None,
    max_pivot_values: int = 1000,
) -> ray.data.Dataset:
    """Wide per-``key_column`` table with one column per distinct
    ``pivot_column`` value: COUNT(*) per (key, pivot) when ``value_column``
    is None, SUM(value_column) otherwise (missing combinations are 0, the
    SQL PIVOT convention). Output columns are named ``str(pivot value)``.

    Scale shape: one pass widens each block into a dense
    (block keys x V) partial; one ``groupby(key)`` over partials finishes.
    """
    values = (
        list(pivot_values)
        if pivot_values is not None
        else _discover_pivot_values(ds, pivot_column, max_pivot_values)
    )
    names = [str(v) for v in values]
    if len(set(names)) != len(names):
        raise ValueError("pivot_table: pivot values collide after str()")
    val_index = pa.array(values)
    counting = value_column is None
    out_type = pa.int64() if counting else pa.float64()
    key_type = ds.schema().base_schema.field(key_column).type

    def partial(batch: pa.Table) -> pa.Table:
        cols = [key_column, pivot_column] + ([] if counting else [value_column])
        t = batch.select(cols)
        empty = pa.table(
            {
                key_column: pa.array([], key_type),
                **{n: pa.array([], out_type) for n in names},
            }
        )
        if t.num_rows == 0:
            return empty
        # keys factorize over ALL rows (SQL GROUP BY keeps a key even when
        # every one of its rows carries an out-of-list pivot value — it
        # just gets an all-zero row); only known pivot rows contribute
        codes = pc.index_in(t[pivot_column], value_set=val_index)
        kd = pc.dictionary_encode(t[key_column])
        kd = kd.combine_chunks() if isinstance(kd, pa.ChunkedArray) else kd
        kcodes = np.asarray(kd.indices, dtype=np.int64)
        keys = kd.dictionary
        nk, nv = len(keys), len(values)
        mat = np.zeros((nk, nv), np.int64 if counting else np.float64)
        known = pc.is_valid(codes).to_numpy(zero_copy_only=False)
        if known.any():
            vcodes = (
                codes.to_numpy(zero_copy_only=False)[known].astype(np.int64)
            )
            if counting:
                np.add.at(mat, (kcodes[known], vcodes), 1)
            else:
                vals = (
                    t[value_column]
                    .to_numpy(zero_copy_only=False)[known]
                    .astype(np.float64)
                )
                np.add.at(mat, (kcodes[known], vcodes), vals)
        return pa.table(
            {
                key_column: keys,
                **{n: pa.array(mat[:, j]) for j, n in enumerate(names)},
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby(key_column).aggregate(
        *[Sum(n, alias_name=n) for n in names]
    )


def unpivot(
    ds: ray.data.Dataset,
    id_columns: list[str],
    value_columns: list[str],
    variable_alias: str = "variable",
    value_alias: str = "value",
) -> ray.data.Dataset:
    """Melt ``value_columns`` into long (id..., variable, value) rows —
    the inverse of :func:`pivot_table`. Values are cast to float64 (the
    melted column must hold every source column's type). Stateless
    per-block transform: no shuffle, output is |value_columns| x rows."""

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = {
            c: pa.concat_arrays(
                [t[c].combine_chunks()] * len(value_columns)
            )
            if n
            else t[c]
            for c in id_columns
        }
        variable = pa.array(
            np.repeat(np.asarray(value_columns, dtype=object), n), pa.string()
        )
        value = np.concatenate(
            [t[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in value_columns]
        ) if n else np.empty(0, np.float64)
        return pa.table({**ids, variable_alias: variable, value_alias: pa.array(value)})

    return ds.map_batches(melt, batch_format="pyarrow")
