"""Benchmark decontamination: flag corpus documents whose n-gram overlap
with a benchmark/test set exceeds a threshold, so training data can be
scrubbed of eval contamination.

Two public contamination rules are supported (both from the published
decontamination literature — the GPT-3 appendix's "any shared 13-gram" rule
and the overlap-fraction rule used by later open datasets):

- ``mode="fraction"``: contaminated iff ``n_hit / n_grams >= threshold``
  (n_grams = the doc's DISTINCT shingles, n_hit = how many of them appear
  anywhere in the benchmark);
- ``mode="any"``: contaminated iff any shingle is shared (``n_hit >= 1``).

Shingles are the reference tokenizer's space-joined n-grams with the exact
edge-case semantics of ``functions/tokenization.shingle_set`` (reference
utils/tokenization.py:5-33), so the DuckDB oracle can recompute the flag
from first principles with the shared grams CTE.

Scale design — the benchmark side is the small side by construction (test
sets), so the hot path is a pure broadcast semi-join with ZERO shuffle:

1. explode the benchmark once into distinct 64-bit shingle hashes (narrow
   int64 Dataset, block-local dedup);
2. if the hash count fits ``broadcast_limit`` (50M ids = 400 MB), sort and
   ``ray.put`` ONCE; one streaming ``map_batches`` pass over the corpus
   computes each doc's hit count by ``searchsorted`` membership and appends
   (n_grams, n_hit, contaminated) — payloads never move, no exchange at all;
3. otherwise (benchmark too big to broadcast) fall back to the co-partition
   path: both sides' gram rows exchange by shingle hash
   (``two_sided_hash_exchange``), per-partition partial hit counts merge
   through a second tiny exchange keyed by row id, and the flags join back
   onto the corpus payloads in one more co-partition pass (each payload row
   crosses the store once — the same fallback contract as
   ``pipelines/exact.py``'s payload shuffle).

Both paths produce identical annotated output (parity-tested with
``broadcast_limit=0``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.tokenization import shingle_set
from ..sources.io import ROW_ID, stamp_row_ids_from_key
from ..stages.exchange import hash_partition_exchange, two_sided_hash_exchange
from .jaccard_dedup import _shingle_hash64

logger = logging.getLogger(__name__)

_STAT_COLUMNS = ("n_grams", "n_hit", "contaminated")

# worker-side cache of the broadcast gram set, keyed by object-ref hex
# (same pattern as stages/assign._BROADCAST_CACHE): one ray.get per worker
# process, not per task — and the get itself is zero-copy from plasma.
_BENCH_CACHE: dict[str, np.ndarray] = {}


def _resolve_bench(ref) -> np.ndarray:
    key = str(ref)
    hit = _BENCH_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _BENCH_CACHE.clear()
        _BENCH_CACHE[key] = hit
    return hit


def _membership(hashes: np.ndarray, sorted_bench: np.ndarray) -> np.ndarray:
    """Boolean mask: which of ``hashes`` appear in the sorted bench array."""
    if len(sorted_bench) == 0 or len(hashes) == 0:
        return np.zeros(len(hashes), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_bench, hashes), 0, len(sorted_bench) - 1)
    return sorted_bench[pos] == hashes


def _flag(n_grams: np.ndarray, n_hit: np.ndarray, threshold: float, mode: str) -> np.ndarray:
    if mode == "any":
        return n_hit >= 1
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(n_grams > 0, n_hit / np.maximum(n_grams, 1), 0.0)
    return (n_grams > 0) & (frac >= threshold)


@dataclass
class DecontaminationResult:
    """``annotated`` is the corpus with (n_grams, n_hit, contaminated)
    appended; ``clean``/``contaminated`` are lazy filtered views of it."""

    annotated: ray.data.Dataset
    metrics: dict[str, Any] = field(default_factory=dict)

    def _filtered(self, keep_contaminated: bool) -> ray.data.Dataset:
        def f(t: pa.Table) -> pa.Table:
            mask = t["contaminated"]
            if not keep_contaminated:
                mask = pc.invert(mask)
            return t.filter(mask)

        return self.annotated.map_batches(f, batch_format="pyarrow")

    @property
    def clean(self) -> ray.data.Dataset:
        return self._filtered(False)

    @property
    def contaminated(self) -> ray.data.Dataset:
        return self._filtered(True)


def _bench_gram_ds(
    benchmark: ray.data.Dataset,
    text_column: str,
    ngram_size: int,
    min_length: int,
    num_partitions: int | None,
) -> ray.data.Dataset:
    """Narrow (sh[, part]) Dataset of the benchmark's block-distinct
    shingle hashes."""

    def explode(batch: pa.Table) -> pa.Table:
        hs: set[int] = set()
        for t in batch[text_column].to_pylist():
            for s in shingle_set(t or "", ngram_size, min_length):
                hs.add(_shingle_hash64(s))
        arr = np.fromiter(hs, dtype=np.int64, count=len(hs))
        cols = {"sh": pa.array(arr, pa.int64())}
        if num_partitions is not None:
            cols["part"] = pa.array(
                (np.abs(arr) % num_partitions).astype(np.int64)
            )
        return pa.table(cols)

    return benchmark.map_batches(explode, batch_format="pyarrow")


def decontaminate(
    corpus: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_column: str = "text",
    id_column: str | None = None,
    bench_text_column: str | None = None,
    ngram_size: int = 8,
    min_length: int = 0,
    threshold: float = 0.8,
    mode: str = "fraction",
    num_partitions: int = 32,
    broadcast_limit: int = 50_000_000,
) -> DecontaminationResult:
    """Annotate every corpus row with its benchmark n-gram overlap and the
    contamination flag. See module docstring for semantics and scale paths."""
    if mode not in ("fraction", "any"):
        raise ValueError(f"mode must be 'fraction' or 'any', got {mode!r}")
    bench_text_column = bench_text_column or text_column
    if id_column is not None:
        corpus = stamp_row_ids_from_key(corpus, id_column)

    # Small side first: distinct shingle hashes of the benchmark. The
    # explode is bounded (benchmark-sized), so materializing the NARROW
    # hash Dataset here is deliberate — it is read twice (count + collect)
    # and must never recompute against a large benchmark.
    bench_grams = _bench_gram_ds(
        benchmark, bench_text_column, ngram_size, min_length, None
    ).materialize()
    n_block_distinct = bench_grams.count()

    if n_block_distinct <= broadcast_limit:
        return _decontaminate_broadcast(
            corpus, bench_grams, text_column, ngram_size, min_length,
            threshold, mode,
        )
    logger.warning(
        "benchmark gram hashes (%d block-distinct) exceed broadcast_limit=%d;"
        " falling back to the co-partition path (corpus payloads cross the"
        " object store once)", n_block_distinct, broadcast_limit,
    )
    if ROW_ID not in (corpus.schema().names or []):
        raise ValueError(
            "the co-partition fallback needs per-row ids: pass id_column or"
            f" stamp {ROW_ID!r} before calling decontaminate()"
        )
    return _decontaminate_shuffle(
        corpus, bench_grams, text_column, ngram_size, min_length,
        threshold, mode, num_partitions,
    )


def _decontaminate_broadcast(
    corpus: ray.data.Dataset,
    bench_grams: ray.data.Dataset,
    text_column: str,
    ngram_size: int,
    min_length: int,
    threshold: float,
    mode: str,
) -> DecontaminationResult:
    blocks = []
    for blk_ref in bench_grams.to_arrow_refs():
        tbl = ray.get(blk_ref)
        if tbl.num_rows:
            blocks.append(tbl["sh"].to_numpy(zero_copy_only=False))
    bench = (
        np.unique(np.concatenate(blocks)) if blocks else np.array([], np.int64)
    )
    ref = ray.put(bench)

    def annotate(batch: pa.Table) -> pa.Table:
        sorted_bench = _resolve_bench(ref)
        texts = batch[text_column].to_pylist()
        n_grams = np.zeros(len(texts), np.int64)
        n_hit = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            sh = shingle_set(t or "", ngram_size, min_length)
            if not sh:
                continue
            hs = np.fromiter(
                (_shingle_hash64(s) for s in sh), np.int64, count=len(sh)
            )
            n_grams[i] = len(sh)
            n_hit[i] = int(_membership(hs, sorted_bench).sum())
        out = batch.drop_columns(
            [c for c in _STAT_COLUMNS if c in batch.column_names]
        )
        return (
            out.append_column("n_grams", pa.array(n_grams))
            .append_column("n_hit", pa.array(n_hit))
            .append_column(
                "contaminated", pa.array(_flag(n_grams, n_hit, threshold, mode))
            )
        )

    annotated = corpus.map_batches(annotate, batch_format="pyarrow")
    return DecontaminationResult(
        annotated, {"path": "broadcast", "bench_grams": int(len(bench))}
    )


def _decontaminate_shuffle(
    corpus: ray.data.Dataset,
    bench_grams: ray.data.Dataset,
    text_column: str,
    ngram_size: int,
    min_length: int,
    threshold: float,
    mode: str,
    num_partitions: int,
) -> DecontaminationResult:
    """Co-partition fallback: gram rows of both sides exchange by shingle
    hash; per-doc hit partials merge by row id; flags join back onto the
    corpus payloads in one co-partition pass. Zero-gram docs emit one
    sentinel row so every corpus row id reaches the stats table."""

    def part_col(arr: np.ndarray) -> pa.Array:
        return pa.array((np.abs(arr) % num_partitions).astype(np.int64))

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        ids = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        out_h: list[int] = []
        out_id: list[int] = []
        out_sz: list[int] = []
        for i, t in enumerate(texts):
            sh = shingle_set(t or "", ngram_size, min_length)
            if not sh:  # sentinel: doc must still appear in the stats
                out_h.append(0)
                out_id.append(int(ids[i]))
                out_sz.append(0)
                continue
            for s in sh:
                out_h.append(_shingle_hash64(s))
                out_id.append(int(ids[i]))
                out_sz.append(len(sh))
        h = np.array(out_h, np.int64)
        return pa.table(
            {
                "sh": pa.array(h, pa.int64()),
                "row_id": pa.array(out_id, pa.int64()),
                "size": pa.array(out_sz, pa.int64()),
                "part": part_col(h),
            }
        )

    left = corpus.map_batches(explode, batch_format="pyarrow")
    right = bench_grams.map_batches(
        lambda t: t.append_column(
            "part", part_col(t["sh"].to_numpy(zero_copy_only=False))
        ),
        batch_format="pyarrow",
    )

    def hit_partial(lt: pa.Table | None, rt: pa.Table | None) -> pa.Table:
        empty = pa.table(
            {
                "row_id": pa.array([], pa.int64()),
                "g": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
            }
        )
        if lt is None or lt.num_rows == 0:
            return empty
        bench = (
            np.unique(rt["sh"].to_numpy(zero_copy_only=False))
            if rt is not None and rt.num_rows
            else np.array([], np.int64)
        )
        rid = lt["row_id"].to_numpy(zero_copy_only=False)
        sz = lt["size"].to_numpy(zero_copy_only=False)
        hit = _membership(lt["sh"].to_numpy(zero_copy_only=False), bench)
        hit &= sz > 0  # sentinel rows never count as hits
        order = np.argsort(rid, kind="stable")
        rid_s, hit_s, sz_s = rid[order], hit[order], sz[order]
        brk = np.r_[True, rid_s[1:] != rid_s[:-1]]
        starts = np.flatnonzero(brk)
        return pa.table(
            {
                "row_id": pa.array(rid_s[starts], pa.int64()),
                "g": pa.array(sz_s[starts].astype(np.int64)),  # total rides on every row
                "h": pa.array(
                    np.add.reduceat(hit_s.astype(np.int64), starts)
                ),
            }
        )

    partials = two_sided_hash_exchange(
        left, right, "part", num_partitions, hit_partial
    )

    def add_rid_part(t: pa.Table) -> pa.Table:
        rid = t["row_id"].to_numpy(zero_copy_only=False)
        return t.append_column("rpart", part_col(rid))

    partials = partials.map_batches(add_rid_part, batch_format="pyarrow")

    def merge_stats(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "row_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "n_hit": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "row_id" not in group.column_names:
            return empty
        rid = group["row_id"].to_numpy(zero_copy_only=False)
        g = group["g"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        order = np.argsort(rid, kind="stable")
        rid_s, g_s, h_s = rid[order], g[order], h[order]
        brk = np.r_[True, rid_s[1:] != rid_s[:-1]]
        starts = np.flatnonzero(brk)
        # n_grams = the doc total (same value on every partial); n_hit sums
        return pa.table(
            {
                "row_id": pa.array(rid_s[starts], pa.int64()),
                "n_grams": pa.array(g_s[starts].astype(np.int64)),
                "n_hit": pa.array(np.add.reduceat(h_s, starts).astype(np.int64)),
            }
        )

    stats = hash_partition_exchange(partials, "rpart", num_partitions, merge_stats)

    corpus_p = corpus.map_batches(
        lambda t: t.append_column(
            "part", part_col(t[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64))
        ),
        batch_format="pyarrow",
    )
    stats_p = stats.map_batches(
        lambda t: t.append_column(
            "part", part_col(t["row_id"].to_numpy(zero_copy_only=False))
        ),
        batch_format="pyarrow",
    )

    def annotate_join(ct: pa.Table | None, st: pa.Table | None) -> pa.Table:
        if ct is None or ct.num_rows == 0:
            # every stats row id came from a corpus row in this partition,
            # so an empty corpus side implies an empty stats side
            return pa.table({})
        rid = ct[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        if st is None or st.num_rows == 0:  # cannot happen (sentinels), but stay safe
            g = np.zeros(len(rid), np.int64)
            h = np.zeros(len(rid), np.int64)
        else:
            srid = st["row_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(srid, kind="stable")
            srid_s = srid[order]
            g_s = st["n_grams"].to_numpy(zero_copy_only=False)[order]
            h_s = st["n_hit"].to_numpy(zero_copy_only=False)[order]
            pos = np.clip(np.searchsorted(srid_s, rid), 0, len(srid_s) - 1)
            ok = srid_s[pos] == rid
            g = np.where(ok, g_s[pos], 0).astype(np.int64)
            h = np.where(ok, h_s[pos], 0).astype(np.int64)
        out = ct.drop_columns(
            ["part"] + [c for c in _STAT_COLUMNS if c in ct.column_names]
        )
        return (
            out.append_column("n_grams", pa.array(g))
            .append_column("n_hit", pa.array(h))
            .append_column(
                "contaminated", pa.array(_flag(g, h, threshold, mode))
            )
        )

    annotated = two_sided_hash_exchange(
        corpus_p, stats_p, "part", num_partitions, annotate_join
    )
    return DecontaminationResult(annotated, {"path": "shuffle", "bench_grams": None})


def substring_decontaminate(
    corpus: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_column: str = "text",
    bench_text_column: str | None = None,
    length_threshold: int = 64,
    drop_empty: bool = True,
    max_bench_windows: int = 50_000_000,
) -> ray.data.Dataset:
    """Substring-level decontamination (Lee et al. exact-substring semantics
    applied cross-corpus): CUT from every corpus doc each maximal byte run
    covered by ``length_threshold``-byte windows that occur anywhere in the
    benchmark — instead of flagging whole docs, only the contaminated spans
    are removed (the suffix-array dedup treatment, with the benchmark as the
    "other occurrence").

    Coverage semantics mirror the engine's suffix oracles exactly: window
    start positions whose L-byte window appears in the benchmark form
    islands (split where the gap > L); each island covers [first, last+L);
    covered runs are cut and the remainder re-joined, dropping docs that
    become empty (``drop_empty``). ASCII byte==char assumption, as in
    ``pipelines/suffix_array``.

    Scale shape: the benchmark is the small side by construction, so this is
    a pure broadcast pass — every block of the benchmark emits its DISTINCT
    64-bit window hashes (bounded by ``max_bench_windows``; raises above it
    — at that size use the anchor-partitioned suffix machinery instead),
    the sorted hash array ships via ``ray.put`` once, and ONE streaming
    ``map_batches`` over the corpus does searchsorted membership + interval
    cuts. Payload rows never shuffle.

    Window identity is a vectorized polynomial rolling hash (FNV-prime
    base, wraparound mod 2^64) — O(bytes) per doc instead of O(L x bytes)
    of per-window digests. Both sides hash identically, so a corpus window
    matches iff the same bytes occur in the benchmark, up to a 64-bit
    collision (probability ~ corpus_windows x bench_windows / 2^64 — e.g.
    ~5e-10 at 2e5 x 5e4 windows — and deterministic for a fixed corpus);
    the DuckDB oracle detects the same window equality via md5 grams, so a
    gate pass certifies the outputs agree."""
    from ..functions.intervals import clean_up

    bcol = bench_text_column or text_column
    L = int(length_threshold)
    win_hashes = lambda data: _rolling_window_hashes(data, L)  # noqa: E731

    def bench_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        hs = [win_hashes((t or "").encode("utf-8")) for t in batch[bcol].to_pylist()]
        merged = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.int64)
        return pa.table({"h": pa.array(merged)})

    pool = (
        benchmark.select_columns([bcol])
        .map_batches(bench_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    bset = (
        np.unique(pool["h"].to_numpy())
        if "h" in pool.columns and len(pool)
        else np.empty(0, np.int64)
    )
    if len(bset) > max_bench_windows:
        raise ValueError(
            f"benchmark has {len(bset)} distinct windows > max_bench_windows="
            f"{max_bench_windows}; use the anchor-partitioned suffix machinery"
        )
    bset_ref = ray.put(bset)

    def cut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        bs = ray.get(bset_ref) if isinstance(bset_ref, ray.ObjectRef) else bset_ref
        texts = batch[text_column].to_pylist()
        out = []
        for t in texts:
            t = t or ""
            if len(bs) == 0:
                out.append(t)
                continue
            hs = win_hashes(t.encode("utf-8"))
            if len(hs) == 0:
                out.append(t)
                continue
            idx = np.clip(np.searchsorted(bs, hs), 0, len(bs) - 1)
            pos = np.flatnonzero(bs[idx] == hs)
            if pos.size == 0:
                out.append(t)
                continue
            brk = np.flatnonzero(np.diff(pos) > L)
            starts = np.r_[pos[0], pos[brk + 1]]
            ends = np.r_[pos[brk], pos[-1]] + L
            out.append(clean_up(t, list(zip(starts.tolist(), ends.tolist()))))
        res = batch.drop_columns([text_column]).append_column(
            text_column, pa.array(out, pa.string())
        )
        if drop_empty:
            import pyarrow.compute as pc

            res = res.filter(pc.greater(pc.utf8_length(res[text_column]), 0))
        return res

    return corpus.map_batches(cut, batch_format="pyarrow")


# polynomial rolling-hash constants: FNV-64 prime base (odd, so invertible
# mod 2^64) and its modular inverse
_ROLL_R = np.uint64(1099511628211)
_ROLL_RINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _rolling_window_hashes(data: bytes, L: int) -> np.ndarray:
    """64-bit hash of every L-byte window of ``data`` in O(len) vectorized
    numpy: h(i) = sum_k data[i+k] * R^(L-1-k) (mod 2^64), computed from the
    prefix sums of data[k] * R^(-k) — equal windows hash equal by
    construction; uint64 wraparound IS the mod."""
    n = len(data)
    m = n - L + 1
    if m <= 0:
        return np.empty(0, np.int64)
    b = np.frombuffer(data, np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        rinv_pow = np.empty(n, np.uint64)
        rinv_pow[0] = 1
        rinv_pow[1:] = _ROLL_RINV
        np.multiply.accumulate(rinv_pow, out=rinv_pow)
        r_pow = np.empty(n, np.uint64)
        r_pow[0] = 1
        r_pow[1:] = _ROLL_R
        np.multiply.accumulate(r_pow, out=r_pow)
        t = np.cumsum(b * rinv_pow, dtype=np.uint64)
        t_prev = np.concatenate(([np.uint64(0)], t[:-1]))  # T[i-1], T[-1]=0
        w = (t[L - 1 :] - t_prev[:m]) * r_pow[L - 1 :]
    return w.view(np.int64)
