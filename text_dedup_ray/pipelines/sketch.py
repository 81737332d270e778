"""HyperLogLog approximate COUNT(DISTINCT) — the sketch scale path.

The exact grouped count-distinct (``pipelines/agg.py``) must move one row
per distinct (key, value) pair through the exchange; at 100 TB with
billions of distinct values that IS the shuffle. HLL replaces it with a
fixed-size register sketch: every block reduces to at most (keys x m)
integer rows regardless of row count, register merge is a plain MAX (so
the result is EXACTLY partition-invariant — not just statistically), and
the estimate lands within ~1.04/sqrt(m) relative error (Flajolet, Fusy,
Gandouet, Meunier 2007).

Determinism contract: the 64-bit hash is the BIG-endian first 8 bytes of
``md5(str(value))`` — recomputable in SQL as
``('0x' || substr(md5(v::VARCHAR), 1, 16))::UBIGINT`` — and the register
table (key, idx, rank) is all-integer, so the driver oracle compares it
EXACTLY (the estimate is then a pure function of those integers; its
accuracy is pytest-bounded against exact counts).

Leading-zero ranks are computed with the same bit-smear + popcount the
SQL oracle uses (never float ``log2`` — the 2^k-1 boundary rounds wrong).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import hash_partition_exchange

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
_GLOBAL_KEY = "__all__"


def _hash64(values: list) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
            for v in values
        ),
        np.uint64,
        count=len(values),
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def _ranks(hv: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: idx = top p bits; rank = leading
    zeros of the remaining w bits + 1 (w+1 when they are all zero)."""
    w = 64 - p
    idx = (hv >> np.uint64(w)).astype(np.int64)
    low = hv & np.uint64((1 << w) - 1)
    x = low.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    bitlen = _popcount64(x)  # bit length of low (0 when low == 0)
    rank = (w - bitlen) + 1
    return idx, rank


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _block_partial(
    batch: pa.Table,
    column: str,
    key: str | None,
    p: int,
    num_partitions: int,
    key_type: pa.DataType | None = None,
) -> pa.Table:
    # key_type is captured from the dataset schema at pipeline-build time
    # so empty blocks can't emit schema-mismatched partials
    if key_type is None:
        key_type = (
            batch.schema.field(key).type
            if (key and key in batch.column_names)
            else pa.string()
        )
    empty = pa.table(
        {
            "key": pa.array([], key_type),
            "idx": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    # NULL values never enter the sketch (SQL COUNT(DISTINCT) semantics;
    # DuckDB md5(NULL) is NULL) — and pd.factorize's -1 sentinel would
    # otherwise fancy-index the block's LAST distinct value's hash into
    # null rows, breaking the module's exact partition-invariance contract
    import pyarrow.compute as _pc

    valid = _pc.is_valid(batch[column])
    if not _pc.all(valid).as_py():
        batch = batch.filter(valid)
        if batch.num_rows == 0:
            return empty
    # md5 only the DISTINCT values of the block (value columns like user
    # ids repeat heavily); hash-based factorize — never a sort of the
    # value column — maps the digests back through the codes
    import pandas as pd

    vals = batch[column].to_numpy(zero_copy_only=False)
    vinv, uvals = pd.factorize(vals)
    hv = _hash64(uvals.tolist())[vinv]
    idx, rank = _ranks(hv, p)
    keys = (
        np.array([str(v) for v in batch[key].to_pylist()], dtype=object)
        if key
        else np.full(len(hv), _GLOBAL_KEY, dtype=object)
    )
    # block-local register max: dedupe (key, idx) keeping the max rank
    order = np.lexsort((-rank, idx, keys))
    sk, si = keys[order], idx[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (sk[1:] != sk[:-1]) | (si[1:] != si[:-1])
    keep = order[first]
    out_keys = keys[keep]
    part = np.fromiter(
        (
            int.from_bytes(hashlib.sha1(k.encode()).digest()[:8], "little")
            % num_partitions
            for k in out_keys
        ),
        np.int64,
        count=len(keep),
    )
    kcol = (
        batch[key].take(pa.array(keep))
        if key
        else pa.array([_GLOBAL_KEY] * len(keep), pa.string())
    )
    return pa.table(
        {
            "key": kcol,
            "idx": pa.array(idx[keep]),
            "rank": pa.array(rank[keep]),
            "part": pa.array(part),
        }
    )


def _fold_registers(group: pa.Table) -> pa.Table:
    empty = pa.table(
        {
            "key": pa.array([], pa.string()),
            "idx": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0 or "idx" not in group.column_names:
        return empty
    keys = np.array([str(v) for v in group["key"].to_pylist()], dtype=object)
    idx = group["idx"].to_numpy(zero_copy_only=False)
    rank = group["rank"].to_numpy(zero_copy_only=False)
    order = np.lexsort((-rank, idx, keys))
    sk, si = keys[order], idx[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (sk[1:] != sk[:-1]) | (si[1:] != si[:-1])
    keep = order[first]
    return pa.table(
        {
            "key": group["key"].take(pa.array(keep)),
            "idx": pa.array(idx[keep]),
            "rank": pa.array(rank[keep]),
        }
    )


def hll_registers(
    ds: ray.data.Dataset,
    column: str,
    key: str | None = None,
    precision: int = 12,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """The merged (key, idx, rank) register table — all-integer, exactly
    partition-invariant, and SQL-recomputable (the oracle surface)."""
    key_type = ds.schema().base_schema.field(key).type if key else pa.string()
    partials = ds.map_batches(
        lambda b: _block_partial(b, column, key, precision, num_partitions, key_type),
        batch_format="pyarrow",
        batch_size=None,
    )
    out = hash_partition_exchange(partials, "part", num_partitions, _fold_registers)
    if key:
        return out.map_batches(
            lambda b: b.rename_columns([key, "idx", "rank"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    return out


def approx_count_distinct(
    ds: ray.data.Dataset,
    column: str,
    key: str | None = None,
    precision: int = 12,
    num_partitions: int = 8,
    alias: str = "approx_n",
) -> ray.data.Dataset:
    """Per-``key`` (or global) approximate COUNT(DISTINCT ``column``):
    one exchange of register partials, estimates folded in-partition
    (every register of a key is co-located by key hash)."""
    m = 1 << precision

    def fold(group: pa.Table) -> pa.Table:
        regs = _fold_registers(group)
        empty = pa.table(
            {"key": pa.array([], pa.string()), alias: pa.array([], pa.int64())}
        )
        if regs.num_rows == 0:
            return empty
        # vectorized per-key estimate: factorize keys, fold the register
        # powers and presence counts with add.at/bincount — no per-key
        # Python loop even with very many distinct keys per partition
        import pandas as pd

        keys = np.array([str(v) for v in regs["key"].to_pylist()], dtype=object)
        rank = regs["rank"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys)
        nk = len(uniq)
        s = np.zeros(nk, np.float64)
        np.add.at(s, codes, np.ldexp(1.0, -rank.astype(np.int64)))
        present = np.bincount(codes, minlength=nk).astype(np.int64)
        zeros = (m - present).astype(np.float64)
        raw = _alpha(m) * m * m / (zeros + s)
        small = (raw <= 2.5 * m) & (zeros > 0)
        est = np.where(
            small,
            np.round(m * np.log(m / np.maximum(zeros, 1.0))),
            np.round(raw),
        ).astype(np.int64)
        first = np.zeros(nk, np.int64)
        first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
        kcol = regs["key"].take(pa.array(first))
        return pa.table({"key": kcol, alias: pa.array(est)})

    key_type = ds.schema().base_schema.field(key).type if key else pa.string()
    partials = ds.map_batches(
        lambda b: _block_partial(b, column, key, precision, num_partitions, key_type),
        batch_format="pyarrow",
        batch_size=None,
    )
    out = hash_partition_exchange(partials, "part", num_partitions, fold)
    if key:
        return out.map_batches(
            lambda b: b.rename_columns([key, alias]),
            batch_format="pyarrow",
            batch_size=None,
        )
    return out.map_batches(
        lambda b: b.drop_columns(["key"]), batch_format="pyarrow", batch_size=None
    )


def cms_registers(
    ds: ray.data.Dataset,
    column: str,
    depth: int = 4,
    width: int = 1024,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Count-min sketch register table ``(d, idx, cnt)`` — the frequency
    sketch beside HLL's cardinality sketch: point-frequency estimates for
    an unbounded-cardinality column in ``depth x width`` integer cells.
    Each block reduces to at most depth x width non-zero cells regardless
    of row count; cell merge is plain integer SUM, so the folded table is
    EXACTLY partition-invariant and SQL-recomputable (row ``d`` buckets by
    the big-endian first 8 bytes of ``md5(str(d) + ':' + str(value))``
    mod width — Cormode & Muthukrishnan 2005)."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "d": pa.array([], pa.int64()),
                "idx": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        # md5 only the DISTINCT values per row d (hash-based factorize, no
        # sort); fold duplicate counts through bincount weights
        import pandas as pd

        vals_np = batch[column].to_numpy(zero_copy_only=False)
        codes, uvals = pd.factorize(vals_np)
        ucnt = np.bincount(codes, minlength=len(uvals)).astype(np.int64)
        out_d, out_i, out_c = [], [], []
        for d in range(depth):
            pre = f"{d}:"
            hv = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5((pre + str(v)).encode()).digest()[:8], "big"
                    )
                    % width
                    for v in uvals
                ),
                np.int64,
                count=len(uvals),
            )
            cnt = np.bincount(hv, weights=ucnt, minlength=width).astype(np.int64)
            nz = np.flatnonzero(cnt)
            out_d.append(np.full(len(nz), d, np.int64))
            out_i.append(nz.astype(np.int64))
            out_c.append(cnt[nz].astype(np.int64))
        dd = np.concatenate(out_d)
        ii = np.concatenate(out_i)
        return pa.table(
            {
                "d": pa.array(dd),
                "idx": pa.array(ii),
                "cnt": pa.array(np.concatenate(out_c)),
                "part": pa.array((dd * width + ii) % num_partitions),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "d": pa.array([], pa.int64()),
                "idx": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "d" not in group.column_names:
            return empty
        dd = group["d"].to_numpy(zero_copy_only=False)
        ii = group["idx"].to_numpy(zero_copy_only=False)
        cc = group["cnt"].to_numpy(zero_copy_only=False)
        key = dd * width + ii
        uniq, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, cc)
        return pa.table(
            {
                "d": pa.array((uniq // width).astype(np.int64)),
                "idx": pa.array((uniq % width).astype(np.int64)),
                "cnt": pa.array(acc),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(pre, "part", num_partitions, fold)


def cms_point_estimates(
    registers: ray.data.Dataset | pa.Table,
    items: list,
    depth: int = 4,
    width: int = 1024,
) -> dict:
    """Point-frequency estimates (min over depth rows) for a small item
    list from a folded ``cms_registers`` table. Estimates never
    undercount; overcounts are bounded by 2N/width per row with prob
    1 - 2^-depth."""
    tbl = registers.to_pandas()  # Dataset and pa.Table both expose this
    cells = {(int(d), int(i)): int(c) for d, i, c in zip(tbl["d"], tbl["idx"], tbl["cnt"])}
    out = {}
    for v in items:
        est = None
        for d in range(depth):
            idx = (
                int.from_bytes(
                    hashlib.md5((f"{d}:" + str(v)).encode()).digest()[:8], "big"
                )
                % width
            )
            c = cells.get((d, idx), 0)
            est = c if est is None else min(est, c)
        out[v] = int(est or 0)
    return out


def dup_rate_estimate(
    ds: ray.data.Dataset,
    column: str,
    key: str | None = None,
    precision: int = 12,
    num_partitions: int = 8,
) -> pa.Table:
    """Pre-flight dedup-savings estimator: per-``key`` (or global) row
    count, HLL approximate distinct count of ``column``, and the implied
    exact-duplicate rate ``1 - distinct/n`` — the number a 100 TB operator
    wants BEFORE paying for a full dedup run (a corpus at ~1% estimated
    dup rate does not justify an exact pass; 30% does).

    Two narrow column-pruned passes (register partials read [key, column];
    the count pass reads ONLY the key, or nothing at all globally —
    ``ds.count()`` answers from metadata when it can); both reductions are
    O(#keys) rows, joined on the driver. NULL semantics mirror SQL
    COUNT(DISTINCT): NULL ``column`` values count in ``n_rows`` but never
    in the distinct estimate; rows with a NULL ``key`` are excluded from
    the keyed report (the sequence-analytics NULL-key precedent).
    Rounding is half-away-from-zero to match DuckDB's ``round()`` — the
    gate oracle (``docs_dup_rate_est``) recomputes the whole estimator in
    SQL and hash-compares exactly, and rates like 1/128 are exact dyadic
    7-decimal ties where banker's rounding would drift."""
    import pyarrow.compute as pc

    if key is not None:
        key_type = ds.schema().base_schema.field(key).type
        ds = ds.map_batches(
            lambda b, k=key: b.filter(pc.is_valid(b[k])),
            batch_format="pyarrow",
        )

    acd = approx_count_distinct(
        ds, column, key=key, precision=precision,
        num_partitions=num_partitions, alias="n_distinct_approx",
    ).to_pandas()

    if key is None:
        n = int(ds.count() or 0)
        if n == 0:  # empty input: no rows, no duplicates, rate 0 by definition
            return pa.table(
                {
                    "n_rows": pa.array([0], pa.int64()),
                    "n_distinct_approx": pa.array([0], pa.int64()),
                    "dup_rate_est": pa.array([0.0], pa.float64()),
                }
            )
        est = int(acd["n_distinct_approx"].iloc[0]) if len(acd) else 0
        merged = pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "n_distinct_approx": pa.array([est], pa.int64()),
            }
        )
    else:
        def cpartial(b: pa.Table) -> pa.Table:
            return b.select([key]).group_by(key).aggregate([([], "count_all")])

        counts = ds.select_columns([key]).map_batches(
            cpartial, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        if key not in counts.columns or not len(counts):
            # empty keyed input: no groups at all (key column keeps its type)
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "n_rows": pa.array([], pa.int64()),
                    "n_distinct_approx": pa.array([], pa.int64()),
                    "dup_rate_est": pa.array([], pa.float64()),
                }
            )
        agg = counts.groupby(key, as_index=False)["count_all"].sum()
        j = agg.merge(acd, on=key, how="left")
        merged = pa.table(
            {
                key: pa.array(j[key].tolist(), key_type),
                "n_rows": pa.array(j["count_all"].astype("int64")),
                "n_distinct_approx": pa.array(
                    j["n_distinct_approx"].fillna(0).astype("int64")
                ),
            }
        )
    clamped = np.minimum(
        merged["n_distinct_approx"].to_numpy(zero_copy_only=False),
        merged["n_rows"].to_numpy(zero_copy_only=False),
    ).astype(np.float64)
    raw = 1.0 - clamped / merged["n_rows"].to_numpy(zero_copy_only=False)
    # half-away-from-zero at 6 decimals (DuckDB round parity); rate >= 0
    rate = np.floor(raw * 1e6 + 0.5) / 1e6
    return merged.append_column("dup_rate_est", pa.array(rate, pa.float64()))
