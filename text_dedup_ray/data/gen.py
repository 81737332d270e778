"""Deterministic synthetic image+caption corpus with planted duplicates.

Implements FIXTURES.md: the primary table has exactly the BASELINE input_hint
shape ``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` plus a sidecar ``truth(image_id, cluster_id,
kind)``. Everything derives from ``numpy.random.RandomState(seed)`` — no
wall-clock, no external data.

Planted cluster kinds (fractions of rows):
- exact          (~5%):  identical caption, same base image re-encoded
                         (png <-> lossy) so the PSNR invariant is non-trivial
- near-jaccard   (~10%): captions perturbed by token substitutions to a
                         target shingle Jaccard in [0.5, 0.95]
- near-hamming   (~5%):  1-2 token swaps -> small SimHash Hamming distance
- shared-substring (~5%): caption pairs sharing a verbatim >=100-byte run
- short           (~2%): captions under the default min_length=5 tokens
- singleton       (rest)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codecs import average_phash, encode_fjpg, encode_png

_VOCAB_SIZE = 2000
_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def _make_vocab(rng: np.random.RandomState, size: int = _VOCAB_SIZE) -> list[str]:
    vocab = set()
    while len(vocab) < size:
        n_syll = rng.randint(1, 4)
        word = "".join(
            _CONS[rng.randint(len(_CONS))] + _VOW[rng.randint(len(_VOW))]
            for _ in range(n_syll)
        )
        vocab.add(word)
    return sorted(vocab)


def _caption(rng: np.random.RandomState, vocab: list[str], lo: int = 10, hi: int = 80) -> list[str]:
    n = rng.randint(lo, hi + 1)
    return [vocab[rng.randint(len(vocab))] for _ in range(n)]


def _perturb_tokens(
    rng: np.random.RandomState, tokens: list[str], vocab: list[str], n_edits: int
) -> list[str]:
    out = list(tokens)
    for _ in range(n_edits):
        op = rng.randint(3)
        pos = rng.randint(len(out))
        word = vocab[rng.randint(len(vocab))]
        if op == 0 and len(out) > 5:
            out.pop(pos)
        elif op == 1:
            out[pos] = word
        else:
            out.insert(pos, word)
    return out


def _image(rng: np.random.RandomState, w: int = 32, h: int = 32) -> np.ndarray:
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def generate_corpus(n: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Return (documents table, truth table)."""
    rng = np.random.RandomState(seed)
    vocab = _make_vocab(rng)

    captions: list[str] = []
    kinds: list[str] = []
    cluster_of: list[int] = []
    base_image_seed: list[int] = []

    plan = [("exact", 0.05, (2, 5)), ("near-jaccard", 0.10, (2, 8)),
            ("near-hamming", 0.05, (2, 3)), ("shared-substring", 0.05, (2, 2))]
    i = 0
    next_cluster = 0
    budget = {k: int(n * frac) for k, frac, _ in plan}
    short_budget = int(n * 0.02)

    while i < n:
        placed = False
        for kind, _frac, (lo, hi) in plan:
            if budget[kind] > 0 and rng.rand() < 0.3:
                size = min(int(rng.randint(lo, hi + 1)), n - i, budget[kind] + 1)
                if size < 2:
                    continue
                cid = next_cluster
                next_cluster += 1
                base = _caption(rng, vocab, lo=20, hi=60)
                img_seed = int(rng.randint(0, 2**31 - 1))
                for m in range(size):
                    if kind == "exact" or m == 0:
                        toks = base
                    elif kind == "near-jaccard":
                        toks = _perturb_tokens(rng, base, vocab, rng.randint(1, max(2, len(base) // 4)))
                    elif kind == "near-hamming":
                        toks = _perturb_tokens(rng, base, vocab, 1)
                    else:  # shared-substring: shared >=100-byte run + random pre/suffix
                        toks = (
                            _caption(rng, vocab, 5, 15)
                            + base[: max(20, len(base) // 2)]
                            + _caption(rng, vocab, 5, 15)
                        )
                    captions.append(" ".join(toks))
                    kinds.append(kind)
                    cluster_of.append(cid)
                    base_image_seed.append(img_seed)
                    i += 1
                budget[kind] -= size - 1
                placed = True
                break
        if placed or i >= n:
            continue
        cid = next_cluster
        next_cluster += 1
        if short_budget > 0 and rng.rand() < 0.05:
            toks = _caption(rng, vocab, 1, 4)
            kinds.append("short")
            short_budget -= 1
        else:
            toks = _caption(rng, vocab)
            kinds.append("singleton")
        captions.append(" ".join(toks))
        cluster_of.append(cid)
        base_image_seed.append(int(rng.randint(0, 2**31 - 1)))
        i += 1

    # images: cluster members share the base image; alternate png / lossy fjpg
    img_bytes: list[bytes] = []
    fmts: list[str] = []
    phashes: list[int] = []
    ws = np.full(n, 32, dtype=np.int32)
    hs = np.full(n, 32, dtype=np.int32)
    seen_in_cluster: dict[int, int] = {}
    for j in range(n):
        member_idx = seen_in_cluster.get(cluster_of[j], 0)
        seen_in_cluster[cluster_of[j]] = member_idx + 1
        pix = _image(np.random.RandomState(base_image_seed[j]))
        fmt = "png" if member_idx % 2 == 0 else "jpeg"
        img_bytes.append(encode_png(pix) if fmt == "png" else encode_fjpg(pix))
        fmts.append(fmt)
        phashes.append(average_phash(pix))

    image_ids = [f"img-{j:012d}" for j in range(n)]
    docs = pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(img_bytes, pa.binary()),
            "w": pa.array(ws),
            "h": pa.array(hs),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )
    truth = pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "cluster_id": pa.array(cluster_of, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )
    return docs, truth


def corpus_parquet(n: int, seed: int = 42, cache_dir: str = "/tmp/tdr_corpus") -> tuple[str, str]:
    """Generate (or reuse a cached) corpus; returns (docs_path, truth_path).

    The cache key is (n, seed); generation is deterministic so reuse is safe.
    """
    os.makedirs(cache_dir, exist_ok=True)
    docs_path = os.path.join(cache_dir, f"docs_n{n}_s{seed}.parquet")
    truth_path = os.path.join(cache_dir, f"truth_n{n}_s{seed}.parquet")
    if not (os.path.exists(docs_path) and os.path.exists(truth_path)):
        docs, truth = generate_corpus(n, seed)
        # small row groups so ray.data.read_parquet can split one file into
        # many read tasks (a single giant row group serializes the read)
        pq.write_table(docs, docs_path + ".tmp", row_group_size=4096)
        pq.write_table(truth, truth_path + ".tmp", row_group_size=65536)
        os.replace(docs_path + ".tmp", docs_path)
        os.replace(truth_path + ".tmp", truth_path)
    return docs_path, truth_path


def image_row_ids(image_ids: list[str]) -> np.ndarray:
    """image_id 'img-%012d' -> int64 row id (order-stable natural key)."""
    return np.array([int(s.rsplit("-", 1)[1]) for s in image_ids], dtype=np.int64)
