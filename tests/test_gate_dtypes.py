"""Gate-smoke dtype parity: for EVERY full-oracle query in the registry, the
engine result's pandas dtype *kind* (int / float / bool / object) must match
the DuckDB oracle's on every shared column at sf0.001.

Why: the driver's correctness gate hashes exact values after sorting columns
by name, so an engine int64 ``100`` vs an oracle float64 ``100.0`` (e.g. a
DuckDB window-``SUM`` returning HUGEINT -> float64) hash-mismatches even when
the values are numerically identical.  Round 4 lost two green verdicts to
exactly this (``token_budget_selection``, ``curated_corpus``); this test makes
the whole registry immune.

Kind granularity is deliberate: the driver's value hash stringifies, so
int32 vs int64 (both repr "100") is fine while int vs float ("100" vs
"100.0") is not — hence kinds {i,u}=int, {f}=float, {b}=bool, rest=object.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"), reason="testdata absent"
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _kind(dtype) -> str:
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "obj"


def test_every_full_oracle_query_matches_oracle_dtypes():
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    mismatches: list[str] = []
    errors: list[str] = []
    for name, fn in qs.items():
        if name not in oracles:
            continue  # rows-only queries have no oracle dtypes to drift from
        try:
            ours = fn(SF)
            if hasattr(ours, "to_pandas"):
                ours = ours.to_pandas()
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001 — collect, report all at once
            errors.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        for c in sorted(set(ours.columns) & set(theirs.columns)):
            ka, kb = _kind(ours[c].dtype), _kind(theirs[c].dtype)
            if ka != kb:
                mismatches.append(
                    f"{name}.{c}: engine {ours[c].dtype} ({ka}) vs oracle "
                    f"{theirs[c].dtype} ({kb})"
                )
    assert not errors, "queries failed to run:\n" + "\n".join(errors)
    assert not mismatches, (
        "dtype-kind drift between engine and oracle (driver value-hash would "
        "mismatch):\n" + "\n".join(mismatches)
    )
