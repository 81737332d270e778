"""Snapshot diff: keyed comparison of two dataset versions.

The ops primitive a 100 TB pipeline needs after every re-run, restore or
migration: given OLD and NEW snapshots sharing a unique key column, report
exactly which keys were ``added`` (only in new), ``removed`` (only in old)
or ``changed`` (in both, value columns differ) — never the unchanged bulk.

Scale shape: each side collapses per block to (key, digest-uint64) — the
value columns never leave their block — then ONE co-partition exchange by
key hash lands both sides' rows for a key in the same reduce task, which
classifies with two sorted merges. Output is O(differences), the exchange
moves O(rows x 16 bytes), and nothing corpus-sized touches the driver.

The digest is the md5-prefix-64 of the value columns' canonical
serialization (``\\x00``-joined, NULL marked), so ``changed`` is
collision-verified to ~2^-64 — the same contract as
``corpus.content_checksums``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.exchange import two_sided_hash_exchange

_STATUS = pa.string()


def _digest_block(
    batch: pa.Table,
    key_column: str,
    value_columns: list[str],
    num_partitions: int,
    key_type: pa.DataType,
) -> pa.Table:
    empty = pa.table(
        {
            "key": pa.array([], key_type),
            "digest": pa.array([], pa.uint64()),
            "part": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    cols = [batch[c].to_pylist() for c in value_columns]
    # validity prefix per value: NULL and the literal string "\x01" must
    # serialize differently
    rows = (
        "\x00".join("\x01" if v is None else "\x02" + str(v) for v in vals).encode()
        for vals in zip(*cols)
    )
    digest = np.fromiter(
        (int(hashlib.md5(r).hexdigest()[:16], 16) for r in rows),
        np.uint64,
        count=batch.num_rows,
    )
    keys = batch[key_column].to_pylist()
    part = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(k).encode()).digest()[:8], "little")
            % num_partitions
            for k in keys
        ),
        np.int64,
        count=batch.num_rows,
    )
    return pa.table(
        {
            "key": batch[key_column],
            "digest": pa.array(digest),
            "part": pa.array(part),
        }
    )


def snapshot_diff(
    old_ds: ray.data.Dataset,
    new_ds: ray.data.Dataset,
    key_column: str,
    value_columns: list[str],
    num_partitions: int = 32,
    status_alias: str = "status",
) -> ray.data.Dataset:
    """Diff two snapshots by unique ``key_column``; returns a Dataset of
    ``(key_column, status)`` with status in {'added','removed','changed'}.
    Unchanged keys are never emitted. Duplicate keys WITHIN a side raise
    in the reduce (a snapshot with non-unique keys has no well-defined
    diff)."""
    key_type = old_ds.schema().base_schema.field(key_column).type

    def narrow(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(
            lambda b: _digest_block(
                b, key_column, value_columns, num_partitions, key_type
            ),
            batch_format="pyarrow",
            batch_size=None,
        )

    def reduce(old: pa.Table | None, new: pa.Table | None) -> pa.Table:
        empty = pa.table(
            {key_column: pa.array([], key_type), status_alias: pa.array([], _STATUS)}
        )

        def arrays(t):
            if t is None or t.num_rows == 0:
                return None, None, None
            keys = t["key"].combine_chunks()
            kv = np.array([str(v) for v in keys.to_pylist()], dtype=object)
            order = np.argsort(kv, kind="stable")
            if len(kv) > 1 and (kv[order][1:] == kv[order][:-1]).any():
                raise ValueError(
                    f"snapshot_diff: duplicate {key_column} within one side"
                )
            dg = t["digest"].to_numpy(zero_copy_only=False)
            return keys.take(pa.array(order)), kv[order], dg[order]

        okeys, ok, od = arrays(old)
        nkeys, nk, nd = arrays(new)
        parts = []
        if ok is None and nk is None:
            return empty
        if ok is None:
            return pa.table(
                {key_column: nkeys, status_alias: pa.array(["added"] * len(nk))}
            )
        if nk is None:
            return pa.table(
                {key_column: okeys, status_alias: pa.array(["removed"] * len(ok))}
            )
        pos = np.searchsorted(nk, ok)
        pos_c = np.minimum(pos, len(nk) - 1)
        in_new = nk[pos_c] == ok
        removed = ~in_new
        changed = in_new & (nd[pos_c] != od)
        rpos = np.searchsorted(ok, nk)
        rpos_c = np.minimum(rpos, len(ok) - 1)
        added = ok[rpos_c] != nk
        if removed.any() or changed.any():
            sel = removed | changed
            parts.append(
                pa.table(
                    {
                        key_column: okeys.filter(pa.array(sel)),
                        status_alias: pa.array(
                            np.where(removed[sel], "removed", "changed")
                        ),
                    }
                )
            )
        if added.any():
            parts.append(
                pa.table(
                    {
                        key_column: nkeys.filter(pa.array(added)),
                        status_alias: pa.array(["added"] * int(added.sum())),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else empty

    return two_sided_hash_exchange(
        narrow(old_ds), narrow(new_ds), "part", num_partitions, reduce
    )
