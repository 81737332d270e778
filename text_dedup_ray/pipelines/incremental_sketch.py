"""Tiered SKETCH state — the incremental pattern applied to corpus
statistics instead of dedup indexes.

HyperLogLog registers merge by per-register MAX and count-min cells by
per-cell SUM, so a saved register table plus the registers of a new batch
fold to EXACTLY the registers of a full re-run over old ∪ new — the same
state ≡ re-run guarantee the dedup families prove, but with a state
footprint of fixed-size integers (m × groups rows / depth × width cells)
instead of a corpus-sized index. That makes daily "distinct shingles per
source" or "per-item frequency" (any keyed sketch stat) a constant-cost
increment at 100 TB: fingerprint only the new batch, one small merge,
never re-reading old data.

State layout follows the shared tiered convention (``meta.json`` +
self-contained ``v%05d`` snapshots, meta sidecar per version), so
``prune_state_versions`` / ``rollback_state`` / the ``state_info`` CLI work
on sketch state unchanged.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .incremental import (
    _clean_version_dir,
    _version_dir,
    _write_meta,
    load_meta,
)
from ..state.checkpoint import config_hash

_ALGO = "hll_sketch"


def _registers_path(state_dir: str, version: int) -> str:
    return os.path.join(_version_dir(state_dir, version), "registers.parquet")


def _cfg_hash(column: str, key: str | None, precision: int) -> str:
    return config_hash(
        {"algo": _ALGO, "column": column, "key": key, "precision": precision}
    )


def _registers_of(
    ds: ray.data.Dataset, column: str, key: str | None, precision: int,
    num_partitions: int,
) -> pa.Table:
    from .sketch import hll_registers

    tabs = [
        t
        for t in ray.get(
            hll_registers(
                ds, column, key=key, precision=precision,
                num_partitions=num_partitions,
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tabs:
        key_type = ds.schema().base_schema.field(key).type if key else None
        cols = {}
        if key:
            cols[key] = pa.array([], key_type)
        cols["idx"] = pa.array([], pa.int64())
        cols["rank"] = pa.array([], pa.int64())
        return pa.table(cols)
    return pa.concat_tables(tabs, promote_options="permissive")


def _max_merge(a: pa.Table, b: pa.Table, key: str | None) -> pa.Table:
    """Per-(key, idx) MAX of ranks — the exact HLL union."""
    both = pa.concat_tables([a, b], promote_options="permissive")
    group_cols = ([key] if key else []) + ["idx"]
    out = both.group_by(group_cols).aggregate([("rank", "max")])
    names = group_cols + ["rank"]
    return out.rename_columns(names).sort_by([(c, "ascending") for c in group_cols])


def hll_state_bootstrap(
    ds: ray.data.Dataset,
    state_dir: str,
    column: str,
    key: str | None = None,
    precision: int = 12,
    num_partitions: int = 8,
) -> int:
    """Compute and persist the initial register table. Returns version 1."""
    regs = _registers_of(ds, column, key, precision, num_partitions)
    version = 1
    _clean_version_dir(state_dir, version)
    os.makedirs(_version_dir(state_dir, version), exist_ok=True)
    pq.write_table(regs, _registers_path(state_dir, version))
    _write_meta(
        state_dir,
        {
            "algo": _ALGO,
            "version": version,
            "cfg_hash": _cfg_hash(column, key, precision),
            "column": column,
            "key": key,
            "precision": precision,
            "num_partitions": num_partitions,
        },
    )
    return version


def hll_state_increment(
    new_ds: ray.data.Dataset,
    state_dir: str,
) -> int:
    """Fold a new batch into the saved registers (parameters come from the
    saved meta). The persisted result is bit-identical to a full
    ``hll_registers`` run over old ∪ new. Returns the new version."""
    meta = load_meta(state_dir)
    if meta.get("algo") != _ALGO:
        raise ValueError(f"state at {state_dir} is not a {_ALGO} state")
    prior_version = int(meta["version"])
    key = meta.get("key")
    regs_new = _registers_of(
        new_ds,
        str(meta["column"]),
        key,
        int(meta["precision"]),
        int(meta["num_partitions"]),
    )
    prior = pq.read_table(_registers_path(state_dir, prior_version))
    merged = _max_merge(prior, regs_new, key)
    version = prior_version + 1
    _clean_version_dir(state_dir, version)
    os.makedirs(_version_dir(state_dir, version), exist_ok=True)
    pq.write_table(merged, _registers_path(state_dir, version))
    meta.update({"version": version})
    _write_meta(state_dir, meta)
    return version


def hll_state_registers(state_dir: str, version: int | None = None) -> pa.Table:
    """Read the saved register table (latest version by default)."""
    v = int(load_meta(state_dir)["version"]) if version is None else int(version)
    return pq.read_table(_registers_path(state_dir, v))


def _union_states(
    state_a: str,
    state_b: str | list[str],
    out_dir: str,
    algo: str,
    merge,
) -> int:
    """Shared k-way sketch-state union: fold every input's current register
    table through ``merge`` (associative, exact) and commit the result as
    ``out_dir`` version 1 with state A's meta. Sketch merges are the exact
    set-union operators (HLL per-register MAX / CMS per-cell SUM), so the
    union state is BIT-identical to a bootstrap over the union corpus —
    unlike the dedup families there is no id-disjointness requirement: a
    row sketched into both states folds idempotently (MAX) or counts twice
    (SUM), exactly as a re-run over the concatenated inputs would."""
    states = [state_a] + (state_b if isinstance(state_b, list) else [state_b])
    metas = [load_meta(s) for s in states]
    for m, d in zip(metas, states):
        if m.get("algo") != algo:
            raise ValueError(f"state at {d} is not a {algo} state")
        if m["cfg_hash"] != metas[0]["cfg_hash"]:
            raise ValueError(
                f"state at {d} was built with a different sketch config; "
                "union requires identical hashing (cfg_hash mismatch)"
            )
    merged = None
    for s, m in zip(states, metas):
        regs = pq.read_table(_registers_path(s, int(m["version"])))
        merged = regs if merged is None else merge(merged, regs)
    version = 1
    _clean_version_dir(out_dir, version)
    os.makedirs(_version_dir(out_dir, version), exist_ok=True)
    pq.write_table(merged, _registers_path(out_dir, version))
    out_meta = dict(metas[0])
    out_meta["version"] = version
    _write_meta(out_dir, out_meta)
    return version


def hll_state_union(
    state_a: str, state_b: str | list[str], out_dir: str
) -> int:
    """Merge independently-built HLL sketch states (two ingestion sites,
    a backfill next to a live feed) into one state whose registers are
    BIT-identical to a :func:`hll_state_bootstrap` over the union corpus —
    per-(key, idx) MAX is exactly the HLL set union. ``state_b`` may be a
    list for a one-pass k-way union. The result is a normal tiered state:
    increment / estimate / prune / rollback apply unchanged. Returns the
    new state's version (1)."""
    key = load_meta(state_a).get("key")
    return _union_states(
        state_a, state_b, out_dir, _ALGO, lambda a, b: _max_merge(a, b, key)
    )


def cms_state_union(
    state_a: str, state_b: str | list[str], out_dir: str
) -> int:
    """Merge independently-built count-min states: per-(d, idx) SUM is the
    exact CMS union (counts are additive), so the union state is
    BIT-identical to a :func:`cms_state_bootstrap` over the concatenated
    corpora. ``state_b`` may be a list for k-way. Returns version 1."""
    return _union_states(state_a, state_b, out_dir, _CMS_ALGO, _sum_merge)


_CMS_ALGO = "cms_sketch"


def _cms_cfg_hash(column: str, depth: int, width: int) -> str:
    return config_hash(
        {"algo": _CMS_ALGO, "column": column, "depth": depth, "width": width}
    )


def _cms_registers_of(
    ds: ray.data.Dataset, column: str, depth: int, width: int,
    num_partitions: int,
) -> pa.Table:
    from .sketch import cms_registers

    tabs = [
        t
        for t in ray.get(
            cms_registers(
                ds, column, depth=depth, width=width,
                num_partitions=num_partitions,
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tabs:
        return pa.table(
            {
                "d": pa.array([], pa.int64()),
                "idx": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tabs, promote_options="permissive")


def _sum_merge(a: pa.Table, b: pa.Table) -> pa.Table:
    """Per-(d, idx) SUM of counts — the exact count-min union."""
    both = pa.concat_tables([a, b], promote_options="permissive")
    out = both.group_by(["d", "idx"]).aggregate([("cnt", "sum")])
    return (
        out.rename_columns(["d", "idx", "cnt"])
        .sort_by([("d", "ascending"), ("idx", "ascending")])
    )


def cms_state_bootstrap(
    ds: ray.data.Dataset,
    state_dir: str,
    column: str,
    depth: int = 4,
    width: int = 1024,
    num_partitions: int = 8,
) -> int:
    """Compute and persist the initial count-min cell table. Returns 1."""
    # canonical (d, idx) order: the same order _sum_merge emits, so an
    # empty increment is a byte-identical no-op
    regs = _cms_registers_of(ds, column, depth, width, num_partitions).sort_by(
        [("d", "ascending"), ("idx", "ascending")]
    )
    version = 1
    _clean_version_dir(state_dir, version)
    os.makedirs(_version_dir(state_dir, version), exist_ok=True)
    pq.write_table(regs, _registers_path(state_dir, version))
    _write_meta(
        state_dir,
        {
            "algo": _CMS_ALGO,
            "version": version,
            "cfg_hash": _cms_cfg_hash(column, depth, width),
            "column": column,
            "depth": depth,
            "width": width,
            "num_partitions": num_partitions,
        },
    )
    return version


def cms_state_increment(
    new_ds: ray.data.Dataset,
    state_dir: str,
) -> int:
    """Fold a new batch's count-min cells into the saved table (parameters
    come from the saved meta). Cell merge is integer SUM, so the persisted
    result is bit-identical to a full ``cms_registers`` run over old ∪
    new. Returns the new version."""
    meta = load_meta(state_dir)
    if meta.get("algo") != _CMS_ALGO:
        raise ValueError(f"state at {state_dir} is not a {_CMS_ALGO} state")
    prior_version = int(meta["version"])
    regs_new = _cms_registers_of(
        new_ds,
        str(meta["column"]),
        int(meta["depth"]),
        int(meta["width"]),
        int(meta["num_partitions"]),
    )
    prior = pq.read_table(_registers_path(state_dir, prior_version))
    merged = _sum_merge(prior, regs_new)
    version = prior_version + 1
    _clean_version_dir(state_dir, version)
    os.makedirs(_version_dir(state_dir, version), exist_ok=True)
    pq.write_table(merged, _registers_path(state_dir, version))
    meta.update({"version": version})
    _write_meta(state_dir, meta)
    return version


def cms_state_registers(state_dir: str, version: int | None = None) -> pa.Table:
    """Read the saved count-min cell table (latest version by default)."""
    v = int(load_meta(state_dir)["version"]) if version is None else int(version)
    return pq.read_table(_registers_path(state_dir, v))


def cms_state_estimate(state_dir: str, items: list) -> dict:
    """Point-frequency estimates (min over depth rows) for a small item
    list from the saved cells — ``sketch.cms_point_estimates`` on state."""
    from .sketch import cms_point_estimates

    meta = load_meta(state_dir)
    return cms_point_estimates(
        cms_state_registers(state_dir), items,
        depth=int(meta["depth"]), width=int(meta["width"]),
    )


def hll_state_estimate(state_dir: str, alias: str = "approx_n") -> pa.Table:
    """Per-key cardinality estimates from the saved registers — the same
    estimator as ``sketch.approx_count_distinct`` applied to state."""
    import numpy as np

    from .sketch import _alpha

    meta = load_meta(state_dir)
    key = meta.get("key")
    m = 1 << int(meta["precision"])
    regs = hll_state_registers(state_dir)
    if regs.num_rows == 0:
        return pa.table(
            {
                **({key: pa.array([], pa.string())} if key else {}),
                alias: pa.array([], pa.int64()),
            }
        )
    import pandas as pd

    df = regs.to_pandas()
    kvals = df[key].astype(str).to_numpy() if key else np.array(["__all__"] * len(df))
    codes, uniq = pd.factorize(kvals)
    nk = len(uniq)
    s = np.zeros(nk, np.float64)
    np.add.at(s, codes, np.ldexp(1.0, -df["rank"].to_numpy(np.int64)))
    present = np.bincount(codes, minlength=nk).astype(np.int64)
    zeros = (m - present).astype(np.float64)
    raw = _alpha(m) * m * m / (zeros + s)
    small = (raw <= 2.5 * m) & (zeros > 0)
    est = np.where(
        small, np.round(m * np.log(m / np.maximum(zeros, 1.0))), np.round(raw)
    ).astype(np.int64)
    cols = {}
    if key:
        first_idx = np.zeros(nk, np.int64)
        first_idx[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
        cols[key] = regs[key].take(pa.array(first_idx))
    cols[alias] = pa.array(est)
    return pa.table(cols)
