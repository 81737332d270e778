"""Sources / sinks (reference: src/text_dedup/data_sources/io.py:31-96).

The reference loads via HF ``datasets`` (parquet/csv/json/HF-dir) and stamps a
row-order ``__INDEX__``. Here:

- ``read_table`` reads parquet/csv/json (and Lance when the ``lance`` wheel is
  importable — the production format named by the input_hint; not present in
  this sandbox, so parquet is the tested path) with column pruning pushed to
  the read.
- ``stamp_row_ids`` produces the deterministic int64 ``row_id`` the clustering
  stages key on. Cluster representatives are component-*minimum* row_ids, so
  ids must be order-stable and independent of task scheduling: we derive them
  from a natural integer key when one exists, else from per-file fragment
  offsets read out of parquet footers (never from task completion order).
- ``write_output`` writes partitioned parquet — a directory of part files, the
  resumable layout (never one giant file).
"""

from __future__ import annotations

import glob
import os
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

try:  # the input_hint's production format; absent in this sandbox
    import lance  # type: ignore  # noqa: F401

    HAS_LANCE = True
except ImportError:  # pragma: no cover
    HAS_LANCE = False

ROW_ID = "row_id"


def _expand(paths: str | Iterable[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(glob.glob(p)))
        else:
            out.append(p)
    return out


def read_table(
    paths: str | Iterable[str],
    columns: list[str] | None = None,
    fmt: str = "parquet",
) -> ray.data.Dataset:
    """Read input into a Dataset with column pruning at the read."""
    if fmt == "parquet":
        return ray.data.read_parquet(_expand(paths), columns=columns)
    if fmt == "lance":
        if not HAS_LANCE:
            raise NotImplementedError("lance is not installed in this environment")
        return ray.data.read_lance(paths, columns=columns)  # pragma: no cover
    if fmt == "csv":
        ds = ray.data.read_csv(_expand(paths))
    elif fmt == "json":
        ds = ray.data.read_json(_expand(paths))
    else:
        raise ValueError(f"unknown format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def stamp_row_ids_from_key(ds: ray.data.Dataset, id_column: str) -> ray.data.Dataset:
    """Fast path: derive ``row_id`` from an existing unique integer key
    (e.g. ``doc_id``), order-stable by construction."""

    def add(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_column], pa.int64())
        if ROW_ID in batch.column_names:
            batch = batch.drop_columns([ROW_ID])
        return batch.append_column(ROW_ID, ids)

    return ds.map_batches(add, batch_format="pyarrow")


def read_parquet_with_row_ids(
    paths: str | Iterable[str], columns: list[str] | None = None
) -> ray.data.Dataset:
    """Scale path for keyless inputs: deterministic ``row_id`` = file offset +
    local row position (equivalent of the reference's ``__INDEX__`` stamping,
    io.py:38-44, but scheduling-independent).

    Per-file row counts come from parquet footers (metadata only — cheap), so
    offsets are known before any data is read. Each file is read as its own
    block and stamped in one whole-block batch. At 100 TB this is one footer
    read per file on the driver, O(files) memory.
    """
    files = _expand(paths)
    offsets = {}
    total = 0
    for f in files:
        offsets[f] = total
        total += pq.ParquetFile(f).metadata.num_rows

    if columns is not None and ROW_ID in columns:
        columns = [c for c in columns if c != ROW_ID]

    def make_stamper(offset: int):
        def stamp(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            ids = pa.array(np.arange(offset, offset + n, dtype=np.int64))
            return batch.append_column(ROW_ID, ids)

        return stamp

    parts = []
    for f in files:
        part = ray.data.read_parquet(f, columns=columns)
        # batch_size=None -> one batch per block; a single-file dataset's
        # blocks arrive in row order, so offset + within-batch arange is
        # correct as long as the file maps to one block. Guard via repartition.
        part = part.repartition(1).map_batches(
            make_stamper(offsets[f]), batch_format="pyarrow", batch_size=None
        )
        parts.append(part)
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    return ds


def write_cluster_table(parents: dict[int, int], path: str) -> None:
    """Persist a cluster map as parquet (row_id, cluster_id) — the engine's
    replacement for the reference's clusters.pickle (io.py:72-77)."""
    from ..stages.cc import cluster_map_to_table

    pq.write_table(cluster_map_to_table(parents), path)


def read_cluster_table(path: str) -> dict[int, int]:
    """Reload a cluster map (reference S5: clusters.pickle reader,
    benchmarks/benchmark_core.py:159-163)."""
    t = pq.read_table(path)
    return dict(
        zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist())
    )


def write_output(
    ds: ray.data.Dataset,
    path: str,
    drop_internal: bool = True,
    internal_columns: tuple[str, ...] = (ROW_ID, "__CLUSTER__", "__duplicate__"),
) -> None:
    """Write a directory of parquet part files, pruning engine-internal
    columns like the reference's save path (io.py:66-96)."""
    if drop_internal:
        present = [c for c in internal_columns if c in ds.schema().names]
        if present:
            ds = ds.drop_columns(present)
    ds.write_parquet(path)
