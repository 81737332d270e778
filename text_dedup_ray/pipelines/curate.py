"""End-to-end corpus curation — the composed pipeline a training-data team
actually runs, as ONE lazy Ray Data chain:

    exact dedup  ->  MinHashLSH near-dup (keep the LONGEST member per
    cluster)  ->  Gopher quality gates  ->  greedy token-budget selection
    ->  sequence-packing plan

Every stage is an already-oracled operator (exact.py, minhash.py,
select.py, textops.py, pack.py); this module wires them so their
composition is itself verifiable — the driver query ``curated_corpus``
hash-matches a single DuckDB statement that recomputes the whole chain
(oracles.curate_sql). With ``collect_metrics=False`` (default) nothing
materializes between stages: the chain streams end-to-end and inherits
each stage's 100 TB posture (hash exchanges over narrow columns, sample-
based range partitioning, no corpus-sized driver state).

Semantics notes (mirrored exactly in the SQL):
* near-dup clusters follow reference MinHash semantics — docs under
  ``cfg.min_length`` tokens never fingerprint and are DROPPED after the
  dedup stage (reference M2), not deduped;
* keep-best ranks (n_tokens DESC, id ASC) — n_tokens is the
  ``[A-Za-z0-9_]+`` count, which equals the reference tokenizer's token
  count on ASCII text;
* budget selection ranks the same way; packing lays survivors out in id
  order (exact int64 offsets).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data

from ..functions.minhash import MinHashConfig


@dataclass
class CurationResult:
    plan: ray.data.Dataset  # (id, n_tokens, offset, first_bin, last_bin, straddles)
    metrics: dict = field(default_factory=dict)


def curate_corpus(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    minhash_cfg: MinHashConfig | None = None,
    gopher_kw: dict | None = None,
    budget: int = 1_000_000,
    capacity: int = 2048,
    num_partitions: int = 16,
    collect_metrics: bool = False,
) -> CurationResult:
    import pyarrow.compute as pc

    from ..sources.io import ROW_ID, stamp_row_ids_from_key
    from .exact import exact_dedup
    from .minhash import minhash_dedup
    from .pack import pack_sequences
    from .select import keep_best_in_cluster, select_token_budget
    from .textops import with_gopher_rules, with_token_counts

    cfg = minhash_cfg or MinHashConfig()
    metrics: dict = {}
    work = stamp_row_ids_from_key(ds, id_column)
    if work.schema() is None:  # empty input: Ray cannot infer a schema
        import pyarrow as pa

        empty = pa.table(
            {
                id_column: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int64()),
                "first_bin": pa.array([], pa.int64()),
                "last_bin": pa.array([], pa.int64()),
                "straddles": pa.array([], pa.bool_()),
            }
        )
        return CurationResult(plan=ray.data.from_arrow(empty), metrics=metrics)
    if collect_metrics:
        work = work.materialize()
        metrics["input_rows"] = work.count()

    # 1. exact dedup: min-id winner per distinct text
    ex = exact_dedup(work, text_column=text_column, num_partitions=num_partitions)
    if collect_metrics:
        ex = ex.materialize()
        metrics["exact_survivors"] = ex.count()

    # 2. near-dup clusters + keep-best survivor policy (reference M2:
    #    sub-min_length docs drop with the dedup stage)
    assigned = minhash_dedup(
        ex, text_column=text_column, cfg=cfg, skip_filtering=True
    ).assigned
    scored = with_token_counts(assigned, text_column=text_column)
    eligible = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tokens"], cfg.min_length)),
        batch_format="pyarrow",
    )
    best = keep_best_in_cluster(
        eligible, "__CLUSTER__", "n_tokens", ROW_ID, num_partitions=num_partitions
    )
    if collect_metrics:
        best = best.materialize()
        metrics["near_dup_survivors"] = best.count()

    # 3. Gopher quality gates
    gated = with_gopher_rules(best, text_column=text_column, **(gopher_kw or {}))
    passed = gated.map_batches(
        lambda t: t.filter(pc.equal(t["gopher_pass"], True)), batch_format="pyarrow"
    )
    if collect_metrics:
        passed = passed.materialize()
        metrics["gopher_survivors"] = passed.count()

    # 4. greedy token-budget selection (score == n_tokens: longest-first)
    selected = select_token_budget(
        passed,
        id_column=id_column,
        token_column="n_tokens",
        score_column="n_tokens",
        budget=budget,
        num_partitions=num_partitions,
    )
    if collect_metrics:
        selected = selected.materialize()
        metrics["selected_docs"] = selected.count()
        metrics["selected_tokens"] = int(selected.sum("n_tokens") or 0)

    # 5. packing plan in id order
    plan = pack_sequences(
        selected,
        token_count_column="n_tokens",
        id_column=id_column,
        capacity=capacity,
        num_partitions=num_partitions,
    )
    return CurationResult(plan=plan, metrics=metrics)
