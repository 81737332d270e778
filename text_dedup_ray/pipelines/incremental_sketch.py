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


# ---------------------------------------------------------------------------
# Tiered bottom-k sample state — the third register family: HLL answers
# "how many distinct", CMS "how often", bottom-k "what does the
# distribution look like" (quantiles / a uniform row sample). The
# deterministic bottom-k-by-hash sample (the approx_quantiles substrate,
# sketch/agg.py) is exactly mergeable: the bottom-k of a union is the
# bottom-k of the merged bottom-ks, so increment and union are BIT-identical
# to a full re-run at k-rows state cost — and the persisted sample stays
# SQL-recomputable (ORDER BY the same md5 expression LIMIT k).
# ---------------------------------------------------------------------------

_BOTTOMK_ALGO = "bottomk_sketch"


def _bottomk_cfg_hash(column: str, id_column: str, k: int, salt: str) -> str:
    return config_hash(
        {
            "algo": _BOTTOMK_ALGO,
            "column": column,
            "id": id_column,
            "k": k,
            "salt": salt,
        }
    )


def _bottomk_of(
    ds: ray.data.Dataset, column: str, id_column: str, k: int, salt: str
) -> pa.Table:
    """Global bottom-k (v, h, i) rows by hash_u32(salt + id), ties by id —
    each block pre-prunes to its local k, one fold keeps the global k."""
    import numpy as np

    from .sample import _hash_u32

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "v": pa.array([], pa.float64()),
                    "h": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int64()),
                }
            )
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        h = _hash_u32(ids.tolist(), salt).astype(np.int64)
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ids, h))[:k]
        return pa.table(
            {
                "v": pa.array(v[order]),
                "h": pa.array(h[order]),
                "i": pa.array(ids[order].astype(np.int64)),
            }
        )

    pre = [
        t
        for t in ray.get(
            ds.map_batches(local, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not pre:
        return pa.table(
            {
                "v": pa.array([], pa.float64()),
                "h": pa.array([], pa.int64()),
                "i": pa.array([], pa.int64()),
            }
        )
    return _bottomk_fold(pa.concat_tables(pre), k)


def _bottomk_fold(t: pa.Table, k: int) -> pa.Table:
    import numpy as np

    h = t["h"].to_numpy(zero_copy_only=False)
    i = t["i"].to_numpy(zero_copy_only=False)
    order = np.lexsort((i, h))[:k]
    return t.take(pa.array(order))


def bottomk_state_bootstrap(
    ds: ray.data.Dataset,
    state_dir: str,
    column: str,
    id_column: str,
    k: int = 4096,
    salt: str = "",
) -> int:
    """Compute and persist the initial bottom-k sample. Returns version 1."""
    regs = _bottomk_of(ds, column, id_column, k, salt)
    version = 1
    _clean_version_dir(state_dir, version)
    os.makedirs(_version_dir(state_dir, version), exist_ok=True)
    pq.write_table(regs, _registers_path(state_dir, version))
    _write_meta(
        state_dir,
        {
            "algo": _BOTTOMK_ALGO,
            "version": version,
            "cfg_hash": _bottomk_cfg_hash(column, id_column, k, salt),
            "column": column,
            "id_column": id_column,
            "k": k,
            "salt": salt,
        },
    )
    return version


def bottomk_state_increment(new_ds: ray.data.Dataset, state_dir: str) -> int:
    """Fold a new batch's bottom-k into the saved sample — bit-identical to
    a full re-run over old ∪ new (bottom-k is exactly mergeable). Returns
    the new version."""
    meta = load_meta(state_dir)
    if meta.get("algo") != _BOTTOMK_ALGO:
        raise ValueError(f"state at {state_dir} is not a {_BOTTOMK_ALGO} state")
    prior_version = int(meta["version"])
    k = int(meta["k"])
    regs_new = _bottomk_of(
        new_ds, str(meta["column"]), str(meta["id_column"]), k,
        str(meta["salt"]),
    )
    prior = pq.read_table(_registers_path(state_dir, prior_version))
    merged = _bottomk_fold(
        pa.concat_tables([prior, regs_new], promote_options="permissive"), k
    )
    version = prior_version + 1
    _clean_version_dir(state_dir, version)
    os.makedirs(_version_dir(state_dir, version), exist_ok=True)
    pq.write_table(merged, _registers_path(state_dir, version))
    meta.update({"version": version})
    _write_meta(state_dir, meta)
    return version


def bottomk_state_union(
    state_a: str, state_b: str | list[str], out_dir: str
) -> int:
    """Merge independently-built bottom-k sample states: keeping the k
    smallest hashes of the merged samples IS the bottom-k of the union
    corpus (every union-bottom-k row is in its own state's bottom-k), so
    the union state is BIT-identical to a bootstrap over A ∪ B. k-way via
    a ``state_b`` list. Returns version 1."""
    k = int(load_meta(state_a)["k"])
    return _union_states(
        state_a, state_b, out_dir, _BOTTOMK_ALGO,
        lambda a, b: _bottomk_fold(
            pa.concat_tables([a, b], promote_options="permissive"), k
        ),
    )


def bottomk_state_sample(state_dir: str, version: int | None = None) -> pa.Table:
    """Read the saved (v, h, i) sample (latest version by default)."""
    v = int(load_meta(state_dir)["version"]) if version is None else int(version)
    return pq.read_table(_registers_path(state_dir, v))


def bottomk_state_quantiles(state_dir: str, quantiles: dict) -> pa.Table:
    """``quantile_disc``-rule estimates over the saved sample — the same
    estimator as ``agg.approx_quantiles`` applied to state."""
    import numpy as np

    sample = bottomk_state_sample(state_dir)
    if sample.num_rows == 0:
        return pa.table(
            {name: pa.array([None], pa.float64()) for name in quantiles}
        )
    vals = np.sort(sample["v"].to_numpy(zero_copy_only=False))
    n = len(vals)
    out = {}
    for name, q in quantiles.items():
        rank = min(max(int(np.ceil(q * n)), 1), n)
        out[name] = pa.array([float(vals[rank - 1])], pa.float64())
    return pa.table(out)
