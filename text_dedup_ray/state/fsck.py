"""State fsck: structural + invariant checks for tiered-index state dirs.

Every tiered family (minhash/simhash, exact, embedding-LSH, the posting
families, HLL/CMS sketches) shares the ``meta.json`` + ``v%05d`` snapshot
convention but stores a different index shape. ``check_state`` verifies,
without recomputing anything corpus-sized:

- meta parses, carries the shared fields, and points at an existing
  version dir;
- the CURRENT version's index files are all present (one per partition for
  the partitioned families), readable, and carry the family's columns;
- cluster rows satisfy the min-root invariant (``cluster_id < row_id`` —
  roots are component minima), stay within ``[0, max_row_id]``, and no
  row_id carries two DIFFERENT cluster ids (scanned across every version
  for the additive families exact/posting, current version otherwise);
- every retained snapshot carries its rollback meta sidecar (warning when
  not — pre-sidecar snapshots can't be rolled back to);
- index row ids stay within ``[0, max_row_id]``.

Driver memory is O(non-trivial cluster rows + index rows of one partition
at a time) — an ops tool bound, not a corpus bound. Returns a report dict;
``ok`` is False iff any ERROR was found (warnings don't fail the check).
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
import pyarrow.parquet as pq

_PARTITIONED = {
    "minhash": ("reps", {"key", "rep"}, "rep"),
    "simhash": ("reps", {"key", "rep"}, "rep"),
    "exact": ("index", {"hash", "winner"}, "winner"),
    "embedding_lsh": ("index", {"row_id", "table_idx", "bucket", "vec"}, "row_id"),
}
_POSTING_COLS = ({"sh", "row_id", "size"}, "row_id")
_ADDITIVE_CLUSTERS = ("exact",)  # plus every *_posting family


def _is_posting(algo: str) -> bool:
    return str(algo).endswith("_posting")


def check_state(state_dir: str) -> dict:
    """Run all checks; returns ``{"ok", "algo", "version", "errors",
    "warnings", "versions", "cluster_rows", "index_rows"}``."""
    errors: list[str] = []
    warnings: list[str] = []
    report = {
        "ok": False, "algo": None, "version": None, "errors": errors,
        "warnings": warnings, "versions": [], "cluster_rows": 0,
        "index_rows": 0,
    }

    meta_path = os.path.join(state_dir, "meta.json")
    if not os.path.isfile(meta_path):
        errors.append("meta.json missing")
        return report
    try:
        with open(meta_path) as fh:
            meta = json.load(fh)
    except Exception as e:  # corrupt json
        errors.append(f"meta.json unreadable: {e}")
        return report

    algo = meta.get("algo")
    report["algo"] = algo
    for field in ("version",):
        if field not in meta:
            errors.append(f"meta.json lacks '{field}'")
            return report
    version = int(meta["version"])
    report["version"] = version
    max_row_id = int(meta.get("max_row_id", np.iinfo(np.int64).max))
    num_partitions = int(meta.get("num_partitions", 0))

    vdirs = sorted(
        d for d in os.listdir(state_dir) if re.fullmatch(r"v\d{5}", d)
    )
    report["versions"] = [int(d[1:]) for d in vdirs]
    cur = os.path.join(state_dir, f"v{version:05d}")
    if not os.path.isdir(cur):
        errors.append(f"meta points at v{version:05d} but the dir is absent")
        return report
    for d in vdirs:
        if int(d[1:]) <= version and not os.path.isfile(
            os.path.join(state_dir, d, "meta.json")
        ):
            warnings.append(f"{d} lacks its rollback meta sidecar")

    # ---- index shape for the CURRENT version -------------------------
    if algo in _PARTITIONED or _is_posting(algo):
        sub, cols, id_col = (
            ("index",) + _POSTING_COLS if _is_posting(algo) else _PARTITIONED[algo]
        )
        files = sorted(glob.glob(os.path.join(cur, sub, "part-*.parquet")))
        if num_partitions and len(files) != num_partitions:
            errors.append(
                f"{sub}/: {len(files)} partition files, meta says "
                f"{num_partitions}"
            )
        n_index = 0
        for f in files:
            try:
                t = pq.read_table(f)
            except Exception as e:
                errors.append(f"{os.path.relpath(f, state_dir)} unreadable: {e}")
                continue
            missing = cols - set(t.column_names)
            if missing:
                errors.append(
                    f"{os.path.relpath(f, state_dir)} lacks columns {sorted(missing)}"
                )
                continue
            n_index += t.num_rows
            if t.num_rows:
                ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                if ids.min() < 0 or ids.max() > max_row_id:
                    errors.append(
                        f"{os.path.relpath(f, state_dir)}: {id_col} outside "
                        f"[0, max_row_id={max_row_id}]"
                    )
        report["index_rows"] = n_index
    elif algo in ("hll_sketch", "cms_sketch", "bottomk_sketch"):
        f = os.path.join(cur, "registers.parquet")
        if not os.path.isfile(f):
            errors.append("registers.parquet missing in current version")
        else:
            try:
                t = pq.read_table(f)
                want = {
                    "hll_sketch": {"idx", "rank"},
                    "cms_sketch": {"d", "idx", "cnt"},
                    "bottomk_sketch": {"v", "h", "i"},
                }[algo]
                missing = want - set(t.column_names)
                if missing:
                    errors.append(f"registers.parquet lacks columns {sorted(missing)}")
                if algo == "bottomk_sketch" and t.num_rows > int(meta.get("k", t.num_rows)):
                    errors.append(
                        f"bottom-k sample has {t.num_rows} rows > k={meta.get('k')}"
                    )
                report["index_rows"] = t.num_rows
            except Exception as e:
                errors.append(f"registers.parquet unreadable: {e}")
    else:
        warnings.append(f"unknown algo '{algo}': index shape not checked")

    # ---- cluster invariants -------------------------------------------
    additive = algo in _ADDITIVE_CLUSTERS or _is_posting(algo)
    cdirs = (
        sorted(glob.glob(os.path.join(state_dir, "v*", "clusters")))
        if additive
        else [os.path.join(cur, "clusters")]
    )
    if additive:
        cdirs = [
            d for d in cdirs
            if int(os.path.basename(os.path.dirname(d))[1:]) <= version
        ]
    rows, cids = [], []
    for d in cdirs:
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            try:
                t = pq.read_table(f)
            except Exception as e:
                errors.append(f"{os.path.relpath(f, state_dir)} unreadable: {e}")
                continue
            if not {"row_id", "cluster_id"} <= set(t.column_names):
                errors.append(
                    f"{os.path.relpath(f, state_dir)} lacks row_id/cluster_id"
                )
                continue
            if t.num_rows:
                rows.append(t["row_id"].to_numpy(zero_copy_only=False).astype(np.int64))
                cids.append(
                    t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                )
    if rows:
        r = np.concatenate(rows)
        c = np.concatenate(cids)
        report["cluster_rows"] = int(len(r))
        if (c >= r).any():
            n = int((c >= r).sum())
            errors.append(
                f"{n} cluster rows violate the min-root invariant "
                "(cluster_id must be < row_id)"
            )
        if r.min() < 0 or r.max() > max_row_id or c.min() < 0:
            errors.append(
                f"cluster ids outside [0, max_row_id={max_row_id}]"
            )
        order = np.argsort(r, kind="stable")
        rs, cs = r[order], c[order]
        same = rs[1:] == rs[:-1]
        conflict = same & (cs[1:] != cs[:-1])
        if conflict.any():
            errors.append(
                f"{int(conflict.sum())} row_ids carry two different cluster ids"
            )
        elif same.any() and not additive:
            warnings.append(
                f"{int(same.sum())} duplicate (row_id, cluster_id) rows "
                "(harmless but unexpected for a self-contained snapshot)"
            )

    report["ok"] = not errors
    return report
