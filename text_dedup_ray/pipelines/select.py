"""Corpus-selection operators — the post-dedup curation steps a training-data
pipeline runs between "clusters are known" and "dataset is final":

* :func:`keep_best_in_cluster` — a quality-aware survivor policy. The dedup
  pipelines keep the MIN-id member per cluster (reference parity,
  e.g. reference ``src/text_dedup/config/algorithms/minhash.py`` assign
  semantics); production pipelines instead keep the *best* member (longest,
  highest quality score). One cluster-hash exchange, one lexsort per
  partition, arg-max by (score DESC, id ASC).

* :func:`select_token_budget` — greedy corpus selection under a global token
  budget: order docs by (score DESC, id ASC) and keep while the running
  token total stays within budget. The global prefix sum over a FLOAT-free
  composite order key reuses the sample-based range-partition plan of
  ``pack.global_prefix_sum`` (narrow 3-pass: sample boundaries -> P partition
  totals on the driver -> per-partition exclusive cumsum); nothing
  corpus-sized ever reaches the driver, so the plan holds at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import distinct_key_partition, hash_partition_exchange

# composite order key c = score * 2^31 + (2^31 - 1 - id) packs
# (score DESC, id ASC) into one int64 DESC sort; both factors must fit
_PACK_BITS = 31
_PACK_BOUND = 1 << _PACK_BITS


def _empty_like(schema: pa.Schema, names: list[str]) -> pa.Table:
    return pa.table(
        {n: pa.array([], schema.field(n).type) for n in names}
    )


def keep_best_in_cluster(
    ds: ray.data.Dataset,
    cluster_column: str,
    score_column: str,
    id_column: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-cluster arg-max survivor selection: keep the single row with the
    highest ``score_column`` (ties -> smallest ``id_column``) in each
    ``cluster_column`` group. All input columns are preserved on the
    survivors. Assumes a cluster's members fit one hash partition (cluster
    sizes are bounded by dedup semantics; the same per-key-fits-a-partition
    contract as the join/window kernels)."""
    base_schema = ds.schema().base_schema
    out_names = [n for n in base_schema.names]

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_like(base_schema, out_names).append_column(
                "__part", pa.array([], pa.int64())
            )
        k = batch[cluster_column].to_numpy(zero_copy_only=False)
        part = distinct_key_partition(k, num_partitions)
        return batch.select(out_names).append_column("__part", pa.array(part))

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or cluster_column not in group.column_names:
            return _empty_like(base_schema, out_names)
        c = group[cluster_column].to_numpy(zero_copy_only=False)
        s = group[score_column].to_numpy(zero_copy_only=False).astype(np.float64)
        i = group[id_column].to_numpy(zero_copy_only=False)
        # primary cluster, then score DESC, then id ASC; group head wins
        order = np.lexsort((i, -s, c))
        cs = c[order]
        heads = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        return group.drop_columns(["__part"]).take(pa.array(order[heads]))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(tagged, "__part", num_partitions, fold)


def select_token_budget(
    ds: ray.data.Dataset,
    id_column: str,
    token_column: str,
    score_column: str,
    budget: int,
    num_partitions: int = 16,
    samples_per_block: int = 32,
) -> ray.data.Dataset:
    """Greedy selection under a global token budget: rank docs by
    (``score_column`` DESC, ``id_column`` ASC) and keep each doc whose
    running token total (inclusive) stays ``<= budget`` — SQL::

        QUALIFY sum(tokens) OVER (ORDER BY score DESC, id
                ROWS UNBOUNDED PRECEDING) <= budget

    Returns (id, tokens, score, sel_offset) for the selected docs, where
    ``sel_offset`` is the exclusive prefix sum in selection order
    (``score_column == token_column`` is allowed — the column appears
    once). Integer scores and ids must fit 31 bits (raises otherwise) so
    the composite order key is exact int64 arithmetic end-to-end."""
    base = ds.schema().base_schema
    value_cols = [id_column, token_column]
    if score_column != token_column:
        value_cols.append(score_column)
    out_schema = pa.schema(
        [pa.field(c, base.field(c).type) for c in value_cols]
        + [pa.field("sel_offset", pa.int64())]
    )
    out_names = value_cols + ["sel_offset"]

    def key(batch: pa.Table) -> np.ndarray:
        s = batch[score_column].to_numpy(zero_copy_only=False).astype(np.int64)
        i = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (
            s.min() < 0
            or s.max() >= _PACK_BOUND
            or i.min() < 0
            or i.max() >= _PACK_BOUND
        ):
            raise ValueError(
                f"select_token_budget needs 0 <= {score_column}/{id_column}"
                f" < 2^{_PACK_BITS} for the exact composite order key"
            )
        # ascending key == (score DESC, id ASC)
        return -(s * _PACK_BOUND + (_PACK_BOUND - 1 - i))

    # ---- pass 1: sample composite keys -> range boundaries
    def sample(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        v = np.sort(key(batch))
        step = max(1, len(v) // samples_per_block)
        return pa.table({"k": pa.array(v[::step][:samples_per_block])})

    slim_src = ds.select_columns(value_cols)
    pool_df = slim_src.map_batches(
        sample, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    pool = (
        np.sort(pool_df["k"].to_numpy())
        if "k" in pool_df.columns
        else np.array([], np.int64)
    )
    if len(pool) == 0:
        return ray.data.from_arrow(_empty_like(out_schema, out_names))
    cuts = np.unique(
        pool[np.linspace(0, len(pool) - 1, num_partitions + 1).astype(int)][1:-1]
    )
    bounds_ref = ray.put(cuts)

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = _empty_like(out_schema, out_names[:-1])
            return t.append_column("__k", pa.array([], pa.int64())).append_column(
                "__rp", pa.array([], pa.int64())
            )
        b = ray.get(bounds_ref) if isinstance(bounds_ref, ray.ObjectRef) else bounds_ref
        k = key(batch)
        part = np.searchsorted(b, k, side="right").astype(np.int64)
        return (
            batch.select(out_names[:-1])
            .append_column("__k", pa.array(k))
            .append_column("__rp", pa.array(part))
        )

    slim = slim_src.map_batches(stamp, batch_format="pyarrow", batch_size=None)

    # ---- pass 2: per-partition token totals -> exclusive base offsets
    def totals(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"__rp": pa.array([], pa.int64()), "t": pa.array([], pa.int64())}
            )
        p = batch["__rp"].to_numpy(zero_copy_only=False)
        v = batch[token_column].to_numpy(zero_copy_only=False).astype(np.int64)
        acc = np.zeros(len(cuts) + 1, np.int64)
        np.add.at(acc, p, v)
        nz = np.flatnonzero(acc)
        return pa.table({"__rp": pa.array(nz.astype(np.int64)), "t": pa.array(acc[nz])})

    tot = slim.map_batches(totals, batch_format="pyarrow", batch_size=None).to_pandas()
    per_part = np.zeros(len(cuts) + 1, np.int64)
    if len(tot):
        np.add.at(per_part, tot["__rp"].to_numpy(), tot["t"].to_numpy())
    base = np.concatenate(([0], np.cumsum(per_part)[:-1]))
    base_ref = ray.put(base)

    # ---- pass 3: range exchange, in-partition cumsum, budget cut
    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "__k" not in group.column_names:
            return _empty_like(out_schema, out_names)
        bb = ray.get(base_ref) if isinstance(base_ref, ray.ObjectRef) else base_ref
        k = group["__k"].to_numpy(zero_copy_only=False)
        v = group[token_column].to_numpy(zero_copy_only=False).astype(np.int64)
        p = int(group["__rp"][0].as_py())
        if bb[p] > budget:  # whole partition past the budget — emit nothing
            return _empty_like(out_schema, out_names)
        order = np.argsort(k, kind="stable")
        csum = np.zeros(len(k), np.int64)
        csum[order[1:]] = np.cumsum(v[order])[:-1]
        csum += bb[p]
        keep = csum + v <= budget
        out = (
            group.drop_columns(["__k", "__rp"])
            .append_column("sel_offset", pa.array(csum))
            .filter(pa.array(keep))
        )
        return out

    return hash_partition_exchange(slim, "__rp", len(cuts) + 1, fold)


def select_token_budget_by_group(
    ds: ray.data.Dataset,
    group_column: str,
    id_column: str,
    token_column: str,
    score_column: str,
    budget: "int | dict",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-GROUP greedy token-budget selection (language / source
    quotas — the "mix by budget" curation policy): within each group,
    rank by (``score_column`` DESC, ``id_column`` ASC) and keep rows
    while the group's running token total stays <= its budget. SQL::

        QUALIFY sum(tokens) OVER (PARTITION BY grp ORDER BY score DESC,
                id ROWS UNBOUNDED PRECEDING) <= budget(grp)

    ``budget`` is one int for every group or a {group: budget} dict
    (groups absent from the dict get budget 0, i.e. are excluded).

    One group-hash exchange co-locates each group in a single partition
    (the per-key-fits-a-partition assumption shared by the join/group
    kernels — groups here are languages/sources, a handful of values);
    the fold is one C++ multi-key sort + a vectorized segmented cumsum.
    Returns (group, id, tokens, score, sel_offset) with ``sel_offset``
    the within-group exclusive prefix sum in selection order."""
    value_cols = [group_column, id_column, token_column]
    if score_column not in value_cols:
        value_cols.append(score_column)
    base = ds.schema().base_schema
    out_schema = pa.schema(
        [pa.field(c, base.field(c).type) for c in value_cols]
        + [pa.field("sel_offset", pa.int64())]
    )
    out_names = value_cols + ["sel_offset"]

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_like(out_schema, out_names[:-1]).append_column(
                "__gp", pa.array([], pa.int64())
            )
        import hashlib as _h

        gp = np.fromiter(
            (
                int.from_bytes(
                    _h.sha1(str(v).encode()).digest()[:8], "little"
                )
                % num_partitions
                for v in batch[group_column].to_pylist()
            ),
            np.int64,
            count=batch.num_rows,
        )
        return batch.select(out_names[:-1]).append_column("__gp", pa.array(gp))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group_column not in group.column_names:
            return _empty_like(out_schema, out_names)
        s = group.drop_columns(["__gp"]).sort_by(
            [
                (group_column, "ascending"),
                (score_column, "descending"),
                (id_column, "ascending"),
            ]
        )
        enc = s[group_column].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        tok = s[token_column].to_numpy(zero_copy_only=False).astype(np.int64)
        brk = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.r_[starts, len(codes)])
        cs = np.cumsum(tok)
        base_off = np.repeat(np.r_[np.int64(0), cs[starts[1:] - 1]], sizes)
        run = cs - base_off  # inclusive within-group running total
        if isinstance(budget, dict):
            uniq = enc.dictionary.to_pylist()
            per_grp = np.fromiter(
                (int(budget.get(g, 0)) for g in uniq), np.int64, count=len(uniq)
            )
            cap = per_grp[codes]
        else:
            cap = np.full(len(codes), int(budget), np.int64)
        keep = run <= cap
        return s.append_column(
            "sel_offset", pa.array((run - tok).astype(np.int64))
        ).filter(pa.array(keep))

    return hash_partition_exchange(tagged, "__gp", num_partitions, fold)


def mixture_select(
    ds: ray.data.Dataset,
    weights: "dict[str, float]",
    total_budget: int,
    group_column: str,
    id_column: str,
    token_column: str,
    score_column: str | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Data-mixture selection (the Pile/Dolma-style recipe): split one
    global token budget across groups by target proportions —
    ``quota_g = floor(total_budget * w_g / sum(w))`` — then run the
    per-group greedy (score DESC, id ASC) selection under each quota.
    Groups absent from ``weights`` get quota 0 (excluded). One wrapper
    over :func:`select_token_budget_by_group`; the quota arithmetic is
    pure integers so the SQL oracle (floor() of the same products) is
    definitionally identical."""
    if not weights:
        raise ValueError("weights must be a non-empty {group: weight} dict")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError(f"weights must sum to > 0, got {total_w}")
    budgets = {
        str(g): int(total_budget * float(w) / total_w) for g, w in weights.items()
    }
    return select_token_budget_by_group(
        ds,
        group_column,
        id_column,
        token_column,
        score_column or token_column,
        budgets,
        num_partitions=num_partitions,
    )
