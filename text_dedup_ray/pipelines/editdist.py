"""Token-level edit-distance-1 near-duplicate detection (deletion
neighborhoods — the SymSpell / PassJoin family, public algorithms).

Finds every pair of rows whose token sequences are within Levenshtein
distance 1 of each other (one substitution, insertion or deletion of a
WHOLE token — the "one word changed" near-dup class that shingle Jaccard
over-triggers on and char-level methods miss). EXACT, verification-free:

* ed = 0  ⟺ the texts are identical (content-hash collapse);
* one INDEL ⟺ deleting one token from the longer yields the shorter
  (a deletion-key of A equals the full-key of B);
* one SUBSTITUTION ⟺ deleting the SAME position i from both yields the
  same string (they differ at exactly position i).

So the full pair set is a pure key join over ``{md5(text)} ∪
{(md5(text minus token i), i)}`` — the pigeonhole math IS the verifier;
no candidate ever needs a distance computation.

Scale shape:
1. identical texts collapse first (content-hash exchange, min-id rep) —
   a hot exact-dup group contributes ONE rep to the key stage, so it can
   never quadratically inflate a deletion bucket; its own pairs (ed=0)
   are emitted in place, bounded by the true output;
2. each DISTINCT text emits L+1 16-byte keys (same volume class as
   shingling); the key-hash exchange co-locates matches; per-partition
   emission is output-bounded (every emitted pair is a true pair);
3. member-level pairs come from two co-partition joins of the rep pairs
   against the membership table — volume = the true member pair count.

No reference equivalent (text-dedup has no edit-distance operator); the
deletion-neighborhood trick is the public SymSpell idea.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.exchange import hash_partition_exchange

_PART = "__ed_part"


def _md5_u64_pair(data: bytes) -> tuple[int, int]:
    d = hashlib.md5(data).digest()
    return (
        int.from_bytes(d[:8], "little", signed=True),
        int.from_bytes(d[8:], "little", signed=True),
    )


def _collapse_identical(
    ds: ray.data.Dataset,
    id_column: str,
    text_column: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """Content-hash exchange -> one union-typed stream with three kinds:
    ``rep`` (a=gid, text), ``member`` (a=member_id, b=gid), ``pair0``
    (a<b, both members of one identical-text group, token_ed=0)."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        # NULL text never pairs (SQL equality/join semantics) — drop here
        if batch[text_column].null_count:
            batch = batch.filter(batch[text_column].combine_chunks().is_valid())
            if batch.num_rows == 0:
                return empty
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_column].to_pylist()
        h = np.array([_md5_u64_pair(t.encode()) for t in texts], np.int64).reshape(
            -1, 2
        )
        return pa.table(
            {
                "h1": pa.array(h[:, 0]),
                "h2": pa.array(h[:, 1]),
                "id": pa.array(ids),
                "text": pa.array(texts, pa.string()),
                _PART: pa.array(np.abs(h[:, 0]) % num_partitions),
            }
        )

    def reduce(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.string()),
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
        if group.num_rows == 0 or "h1" not in group.column_names:
            return empty
        h1 = group["h1"].to_numpy(zero_copy_only=False)
        h2 = group["h2"].to_numpy(zero_copy_only=False)
        ids = group["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h2, h1))
        h1s, h2s, ids_s = h1[order], h2[order], ids[order]
        first = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        gstart = np.flatnonzero(first)
        gsize = np.diff(np.r_[gstart, len(ids_s)])
        gid = np.repeat(ids_s[gstart], gsize)  # min id per group (sorted)
        texts = group["text"].take(pa.array(order[gstart]))
        kinds = ["rep"] * len(gstart)
        a = ids_s[gstart].tolist()
        b = [-1] * len(gstart)
        txt: list = texts.to_pylist()
        # members (every row) and within-group ed=0 pairs (output-bounded)
        kinds += ["member"] * len(ids_s)
        a += ids_s.tolist()
        b += gid.tolist()
        txt += [None] * len(ids_s)
        big = np.flatnonzero(gsize > 1)
        for gi in big:
            mem = ids_s[gstart[gi] : gstart[gi] + gsize[gi]]
            iu, ju = np.triu_indices(len(mem), k=1)
            kinds += ["pair0"] * len(iu)
            a += mem[iu].tolist()
            b += mem[ju].tolist()
            txt += [None] * len(iu)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "text": pa.array(txt, pa.string()),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(pre, _PART, num_partitions, reduce)


# empty text = ZERO tokens (DuckDB str_split semantics, so the SQL
# oracle and the engine agree on degenerate rows)
def default_tokenizer(s: str) -> list[str]:
    return s.split(" ") if s else []


def key_rows_for_text(text: str, gid: int, tokenizer=default_tokenizer):
    """The deletion-neighborhood key rows of one distinct text:
    ``[(k1, k2, pos, gid)]`` with pos == -1 for the full-text key."""
    toks = tokenizer(text)
    a, b = _md5_u64_pair(text.encode())
    rows = [(a, b, -1, gid)]
    for i in range(len(toks)):
        a, b = _md5_u64_pair(" ".join(toks[:i] + toks[i + 1 :]).encode())
        rows.append((a, b, i, gid))
    return rows


def pairs_from_key_rows(
    k1: np.ndarray,
    k2: np.ndarray,
    pos: np.ndarray,
    gid: np.ndarray,
    side: np.ndarray | None = None,
) -> np.ndarray:
    """Emit the ed=1 pair set from co-located key rows — the single home
    of the matching rules (INDEL: a deletion of A equals B's full key;
    SUBSTITUTION: same deletion at the SAME position). With ``side``
    (0 = old, 1 = new) only pairs involving at least one NEW gid are
    emitted — the tiered-increment contract (old-old connectivity is
    already folded into the prior cluster map). Returns a unique
    (n, 2) int64 array with a < b per row."""
    order = np.lexsort((gid, pos, k2, k1))
    k1s, k2s, ps, gs = k1[order], k2[order], pos[order], gid[order]
    sd = side[order] if side is not None else None
    first = np.r_[True, (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])]
    starts = np.flatnonzero(first)
    sizes = np.diff(np.r_[starts, len(k1s)])
    out_a: list[int] = []
    out_b: list[int] = []
    for s, n in zip(starts[sizes > 1], sizes[sizes > 1]):
        p = ps[s : s + n]
        g = gs[s : s + n]
        sv = sd[s : s + n] if sd is not None else None
        is_full = p == -1
        full = g[is_full]
        full_sd = sv[is_full] if sv is not None else None
        dels = g[~is_full]
        dpos = p[~is_full]
        dels_sd = sv[~is_full] if sv is not None else None
        # INDEL: a deletion of A equals the full text of B
        if len(full) and len(dels):
            for fi, fb in enumerate(full.tolist()):
                for di, da in enumerate(dels.tolist()):
                    if da == fb:
                        continue
                    if sv is not None and not (full_sd[fi] or dels_sd[di]):
                        continue  # old-old: already in the prior map
                    out_a.append(min(da, fb))
                    out_b.append(max(da, fb))
        # SUBSTITUTION: same deletion at the SAME position
        if len(dels) > 1:
            du = np.lexsort((dels, dpos))
            dp, dg = dpos[du], dels[du]
            dsd = dels_sd[du] if sv is not None else None
            pf = np.r_[True, dp[1:] != dp[:-1]]
            pst = np.flatnonzero(pf)
            psz = np.diff(np.r_[pst, len(dp)])
            for s2, n2 in zip(pst[psz > 1], psz[psz > 1]):
                mem = dg[s2 : s2 + n2]
                msd = dsd[s2 : s2 + n2] if sv is not None else None
                um, ui = np.unique(mem, return_index=True)
                umsd = msd[ui] if sv is not None else None
                iu, ju = np.triu_indices(len(um), k=1)
                if sv is not None:
                    keep = umsd[iu].astype(bool) | umsd[ju].astype(bool)
                    iu, ju = iu[keep], ju[keep]
                out_a += um[iu].tolist()
                out_b += um[ju].tolist()
    if not out_a:
        return np.empty((0, 2), np.int64)
    a = np.asarray(out_a, np.int64)
    b = np.asarray(out_b, np.int64)
    return np.unique(np.stack([a, b], 1), axis=0)


def _rep_ed1_pairs(
    collapsed: ray.data.Dataset,
    num_partitions: int,
    tokenizer=default_tokenizer,
) -> ray.data.Dataset:
    """Deletion-neighborhood key join over the distinct-text reps ->
    (ga < gb) pairs with token edit distance EXACTLY 1."""

    def keys(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k1": pa.array([], pa.int64()),
                "k2": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "gid": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "kind" not in batch.column_names:
            return empty
        import pyarrow.compute as pc

        reps = batch.filter(pc.equal(batch["kind"], "rep"))
        if reps.num_rows == 0:
            return empty
        gids = reps["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = reps["text"].to_pylist()
        k1, k2, pos, gid = [], [], [], []
        for g, t in zip(gids.tolist(), texts):
            for a, b, i, gg in key_rows_for_text(t, g, tokenizer):
                k1.append(a)
                k2.append(b)
                pos.append(i)
                gid.append(gg)
        k1a = np.asarray(k1, np.int64)
        return pa.table(
            {
                "k1": pa.array(k1a),
                "k2": pa.array(np.asarray(k2, np.int64)),
                "pos": pa.array(np.asarray(pos, np.int64)),
                "gid": pa.array(np.asarray(gid, np.int64)),
                _PART: pa.array(np.abs(k1a) % num_partitions),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ga": pa.array([], pa.int64()), "gb": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "k1" not in group.column_names:
            return empty
        u = pairs_from_key_rows(
            group["k1"].to_numpy(zero_copy_only=False),
            group["k2"].to_numpy(zero_copy_only=False),
            group["pos"].to_numpy(zero_copy_only=False),
            group["gid"].to_numpy(zero_copy_only=False),
        )
        if not len(u):
            return empty
        return pa.table({"ga": pa.array(u[:, 0]), "gb": pa.array(u[:, 1])})

    keyed = collapsed.map_batches(keys, batch_format="pyarrow", batch_size=None)
    return hash_partition_exchange(keyed, _PART, num_partitions, emit)


def _expand_members(
    rep_pairs: ray.data.Dataset,
    collapsed: ray.data.Dataset,
    num_partitions: int,
) -> ray.data.Dataset:
    """(ga, gb) rep pairs -> member-level pairs via two co-partition
    joins against the (member, gid) table — each join moves only pair
    rows + membership rows, so volume is bounded by the true output."""
    import pyarrow.compute as pc

    def members_tagged(side_col: str):
        def f(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "role": pa.array([], pa.string()),
                    "key": pa.array([], pa.int64()),
                    "m": pa.array([], pa.int64()),
                    "other": pa.array([], pa.int64()),
                    _PART: pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0 or "kind" not in batch.column_names:
                return empty
            mem = batch.filter(pc.equal(batch["kind"], "member"))
            if mem.num_rows == 0:
                return empty
            m = mem["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            g = mem["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "role": pa.array(["mem"] * len(m), pa.string()),
                    "key": pa.array(g),
                    "m": pa.array(m),
                    "other": pa.array(np.full(len(m), -1, np.int64)),
                    _PART: pa.array(np.abs(g) % num_partitions),
                }
            )

        return f

    def pairs_tagged(key_col: str, other_col: str):
        def f(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "role": pa.array([], pa.string()),
                    "key": pa.array([], pa.int64()),
                    "m": pa.array([], pa.int64()),
                    "other": pa.array([], pa.int64()),
                    _PART: pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0 or key_col not in batch.column_names:
                return empty
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            o = batch[other_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "role": pa.array(["pair"] * len(k), pa.string()),
                    "key": pa.array(k),
                    "m": pa.array(np.full(len(k), -1, np.int64)),
                    "other": pa.array(o),
                    _PART: pa.array(np.abs(k) % num_partitions),
                }
            )

        return f

    def join(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"m": pa.array([], pa.int64()), "other": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "role" not in group.column_names:
            return empty
        roles = np.asarray(group["role"].to_pylist(), object)
        key = group["key"].to_numpy(zero_copy_only=False)
        m = group["m"].to_numpy(zero_copy_only=False)
        other = group["other"].to_numpy(zero_copy_only=False)
        is_mem = roles == "mem"
        mk, mm = key[is_mem], m[is_mem]
        pk, po = key[~is_mem], other[~is_mem]
        if not len(mk) or not len(pk):
            return empty
        order = np.argsort(mk, kind="stable")
        mk, mm = mk[order], mm[order]
        lo = np.searchsorted(mk, pk, "left")
        hi = np.searchsorted(mk, pk, "right")
        cnt = hi - lo
        rep_idx = np.repeat(np.arange(len(pk)), cnt)
        flat = np.concatenate(
            [np.arange(l, h) for l, h in zip(lo, hi) if h > l]
        ) if cnt.sum() else np.empty(0, np.int64)
        return pa.table(
            {
                "m": pa.array(mm[flat].astype(np.int64)),
                "other": pa.array(po[rep_idx].astype(np.int64)),
            }
        )

    mem_a = collapsed.map_batches(
        members_tagged("b"), batch_format="pyarrow", batch_size=None
    )
    p1 = rep_pairs.map_batches(
        pairs_tagged("ga", "gb"), batch_format="pyarrow", batch_size=None
    )
    # join 1: ga -> its members; carry gb
    j1 = hash_partition_exchange(mem_a.union(p1), _PART, num_partitions, join)

    def j1_as_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "role": pa.array([], pa.string()),
                "key": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
                "other": pa.array([], pa.int64()),
                _PART: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "m" not in batch.column_names:
            return empty
        a_mem = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        gb = batch["other"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "role": pa.array(["pair"] * len(gb), pa.string()),
                "key": pa.array(gb),
                "m": pa.array(np.full(len(gb), -1, np.int64)),
                "other": pa.array(a_mem),
                _PART: pa.array(np.abs(gb) % num_partitions),
            }
        )

    mem_b = collapsed.map_batches(
        members_tagged("b"), batch_format="pyarrow", batch_size=None
    )
    p2 = j1.map_batches(j1_as_pairs, batch_format="pyarrow", batch_size=None)
    j2 = hash_partition_exchange(mem_b.union(p2), _PART, num_partitions, join)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "token_ed": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "m" not in batch.column_names:
            return empty
        b_mem = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_mem = batch["other"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.minimum(a_mem, b_mem)),
                "dst": pa.array(np.maximum(a_mem, b_mem)),
                "token_ed": pa.array(np.ones(len(a_mem), np.int64)),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow", batch_size=None)


def token_ed1_pairs(
    ds: ray.data.Dataset,
    id_column: str,
    text_column: str = "text",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """EXACT member-level pair set ``(src < dst, token_ed in {0, 1})`` —
    every pair of rows whose token sequences are identical (0) or one
    whole-token edit apart (1). See the module docstring for the
    verification-free deletion-neighborhood construction."""
    import pyarrow.compute as pc

    collapsed = _collapse_identical(ds, id_column, text_column, num_partitions)
    rep_pairs = _rep_ed1_pairs(collapsed, num_partitions)
    expanded = _expand_members(rep_pairs, collapsed, num_partitions)

    def pair0(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "token_ed": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "kind" not in batch.column_names:
            return empty
        p0 = batch.filter(pc.equal(batch["kind"], "pair0"))
        return pa.table(
            {
                "src": p0["a"].cast(pa.int64()),
                "dst": p0["b"].cast(pa.int64()),
                "token_ed": pa.array(np.zeros(p0.num_rows, np.int64)),
            }
        )

    zeros = collapsed.map_batches(pair0, batch_format="pyarrow", batch_size=None)
    return zeros.union(expanded)


def token_ed1_dedup(
    ds: ray.data.Dataset,
    id_column: str,
    text_column: str = "text",
    num_partitions: int = 16,
    driver_threshold: int = 2_000_000,
):
    """Cluster map (min-id roots) over the token-ed<=1 duplicate graph:
    identical-text star edges (member -> group rep) plus the rep-level
    ed=1 pairs — connectivity needs no member-level pair expansion, so
    the edge volume stays at O(rows + rep pairs)."""
    import pyarrow.compute as pc

    from ..stages.cc import connected_components_auto

    collapsed = _collapse_identical(ds, id_column, text_column, num_partitions)
    rep_pairs = _rep_ed1_pairs(collapsed, num_partitions)

    def member_edges(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0 or "kind" not in batch.column_names:
            return empty
        mem = batch.filter(pc.equal(batch["kind"], "member"))
        m = mem["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = mem["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = m != g
        return pa.table(
            {"src": pa.array(g[keep]), "dst": pa.array(m[keep])}
        )

    def pair_edges(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0 or "ga" not in batch.column_names:
            return empty
        return pa.table({"src": batch["ga"], "dst": batch["gb"]})

    stars = collapsed.map_batches(member_edges, batch_format="pyarrow", batch_size=None)
    reps = rep_pairs.map_batches(pair_edges, batch_format="pyarrow", batch_size=None)
    return connected_components_auto(
        stars.union(reps), driver_threshold=driver_threshold
    )
