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


_VID_W = 16
_VID_H = 16


def _frame(fseed: int) -> np.ndarray:
    return np.random.RandomState(fseed).randint(
        0, 256, size=(_VID_H, _VID_W), dtype=np.uint8
    )


def _planted_seed_sets(
    rng: np.random.RandomState,
    n: int,
    len_lo: int,
    len_hi: int,
    kind_names: tuple[str, str, str, str],
) -> tuple[list[list[int]], list[str], list[int]]:
    """Shared planted-duplicate plan for SET-signature corpora (video
    frames, audio windows): each row is a list of element seeds; duplicate
    kinds are (exact copy, suffix-trim keeping 60-95%, replace 5-25% of
    elements, replace 45-60% = below-0.5-threshold near-miss), at fractions
    (6%, 8%, 8%, 4%), clusters of 2-3, singletons for the rest. Returns
    (seed_lists, kinds, cluster_of); fully determined by ``rng``."""
    seed_lists: list[list[int]] = []
    kinds: list[str] = []
    cluster_of: list[int] = []

    def fresh(k: int) -> list[int]:
        return [int(s) for s in rng.randint(0, 2**31 - 1, size=k)]

    exact_k, trim_k, replace_k, miss_k = kind_names
    plan = [(exact_k, 0.06), (trim_k, 0.08), (replace_k, 0.08), (miss_k, 0.04)]
    budget = {k: int(n * frac) for k, frac in plan}
    i = 0
    next_cluster = 0
    while i < n:
        placed = False
        for kind, _frac in plan:
            if budget[kind] > 0 and rng.rand() < 0.25 and n - i >= 2:
                size = min(int(rng.randint(2, 4)), n - i, budget[kind] + 1)
                if size < 2:
                    continue
                cid = next_cluster
                next_cluster += 1
                base = fresh(int(rng.randint(len_lo, len_hi + 1)))
                for m in range(size):
                    if kind == exact_k or m == 0:
                        elems = list(base)
                    elif kind == trim_k:
                        keep = int(len(base) * rng.uniform(0.6, 0.95))
                        elems = base[: max(keep, 1)]
                    else:  # replace a fraction in place
                        r = (
                            rng.uniform(0.05, 0.25)
                            if kind == replace_k
                            else rng.uniform(0.45, 0.6)
                        )
                        elems = list(base)
                        n_rep = max(1, int(len(elems) * r))
                        pos = rng.choice(len(elems), size=n_rep, replace=False)
                        for p, s in zip(pos, fresh(n_rep)):
                            elems[p] = s
                    seed_lists.append(elems)
                    kinds.append(kind)
                    cluster_of.append(cid)
                    i += 1
                budget[kind] -= size - 1
                placed = True
                break
        if placed or i >= n:
            continue
        cid = next_cluster
        next_cluster += 1
        seed_lists.append(fresh(int(rng.randint(len_lo, len_hi + 1))))
        kinds.append("singleton")
        cluster_of.append(cid)
        i += 1
    return seed_lists, kinds, cluster_of


def generate_videos(n: int, seed: int = 7) -> tuple[pa.Table, pa.Table]:
    """Deterministic synthetic VIDEO corpus with planted near-duplicates.

    Schema mirrors the image table's opaque-binary stance: ``(video_id:
    string, bytes:binary, fmt:'rawv', n_frames:int32, w:int32, h:int32,
    frame_phashes:list<int64>)`` plus a ``truth(video_id, cluster_id,
    kind)`` sidecar. ``bytes`` is the rawv container (concatenated w*h-byte
    grayscale frames — functions/codecs has no video codec, FIXTURES.md
    stance); ``frame_phashes`` is the per-frame average_phash ground truth
    the SQL oracles read, recomputed from the raw bytes by the pipeline.

    Planted kinds (each duplicate shares a cluster with its base):
    - exact     (~6%): identical frame list -> Jaccard 1.0
    - trimmed   (~8%): the base with a SUFFIX of frames dropped (suffix-only
                       so every_n sampling sees a clean subset) -> Jaccard =
                       kept/total in [0.6, 0.95]
    - perturbed (~8%): fraction r in [0.05, 0.25] of frames replaced by new
                       noise -> Jaccard (1-r)/(1+r) in [0.6, 0.9]
    - near-miss (~4%): r in [0.45, 0.6] -> Jaccard ~[0.25, 0.38], planted
                       BELOW the 0.5 gate threshold (same cluster_id in
                       truth, must NOT merge at threshold 0.5)
    - singleton (rest)
    """
    rng = np.random.RandomState(seed)
    fseed_lists, kinds, cluster_of = _planted_seed_sets(
        rng, n, 12, 48, ("exact", "trimmed", "perturbed", "near-miss")
    )

    from ..functions.codecs import average_phash_stack

    blobs: list[bytes] = []
    phash_lists: list[list[int]] = []
    nfs = np.empty(n, dtype=np.int32)
    for j, frames in enumerate(fseed_lists):
        pix = np.stack([_frame(s) for s in frames])
        blobs.append(pix.tobytes())
        phash_lists.append([int(p) for p in average_phash_stack(pix)])
        nfs[j] = len(frames)

    video_ids = [f"vid-{j:09d}" for j in range(n)]
    videos = pa.table(
        {
            "video_id": pa.array(video_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(["rawv"] * n, pa.string()),
            "n_frames": pa.array(nfs),
            "w": pa.array(np.full(n, _VID_W, dtype=np.int32)),
            "h": pa.array(np.full(n, _VID_H, dtype=np.int32)),
            "frame_phashes": pa.array(phash_lists, pa.list_(pa.int64())),
        }
    )
    truth = pa.table(
        {
            "video_id": pa.array(video_ids, pa.string()),
            "cluster_id": pa.array(cluster_of, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )
    return videos, truth


_AUD_WINDOW = 1024  # samples per fingerprint window (folds to 32x32)


def generate_audio(n: int, seed: int = 11) -> tuple[pa.Table, pa.Table]:
    """Deterministic synthetic AUDIO corpus with planted near-duplicates.

    Schema: ``(audio_id:string, bytes:binary, fmt:'rawa', n_samples:int64,
    sr:int32, window_hashes:list<int64>)`` plus ``truth(audio_id,
    cluster_id, kind)``. ``bytes`` is the rawa container — raw mono uint8
    PCM (no audio codec exists in this environment; real decoders slot in
    front of the same stages). ``window_hashes`` is the ground truth the
    SQL oracles read: each non-overlapping 1024-sample window folded to
    32x32 and hashed by the SAME mean-threshold kernel the image/video
    families use (functions/codecs.average_phash_stack) — recomputed from
    the raw bytes by the pipeline.

    Planted kinds mirror the video generator (same fractions): exact /
    clipped (suffix windows dropped, Jaccard in [0.6, 0.95]) / re-noised
    (5-25% of windows replaced) / near-miss (45-60% replaced, below the
    0.5 gate threshold) / singleton.
    """
    rng = np.random.RandomState(seed)
    wseed_lists, kinds, cluster_of = _planted_seed_sets(
        rng, n, 20, 80, ("exact", "clipped", "re-noised", "near-miss")
    )

    from ..functions.codecs import average_phash_stack

    blobs: list[bytes] = []
    hash_lists: list[list[int]] = []
    n_samples = np.empty(n, dtype=np.int64)
    for j, wins in enumerate(wseed_lists):
        pcm = np.concatenate(
            [
                np.random.RandomState(s).randint(0, 256, size=_AUD_WINDOW, dtype=np.uint8)
                for s in wins
            ]
        )
        blobs.append(pcm.tobytes())
        folded = pcm.reshape(len(wins), 32, 32)
        hash_lists.append([int(p) for p in average_phash_stack(folded)])
        n_samples[j] = len(pcm)

    audio_ids = [f"aud-{j:09d}" for j in range(n)]
    audio = pa.table(
        {
            "audio_id": pa.array(audio_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(["rawa"] * n, pa.string()),
            "n_samples": pa.array(n_samples),
            "sr": pa.array(np.full(n, 16000, dtype=np.int32)),
            "window_hashes": pa.array(hash_lists, pa.list_(pa.int64())),
        }
    )
    truth = pa.table(
        {
            "audio_id": pa.array(audio_ids, pa.string()),
            "cluster_id": pa.array(cluster_of, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )
    return audio, truth


def audio_parquet(
    n: int, seed: int = 11, cache_dir: str = "/tmp/tdr_corpus"
) -> tuple[str, str]:
    """Generate (or reuse a cached) audio corpus; returns (audio_path,
    truth_path). Cache key (n, seed); generation is deterministic."""
    os.makedirs(cache_dir, exist_ok=True)
    aud_path = os.path.join(cache_dir, f"audio_n{n}_s{seed}.parquet")
    truth_path = os.path.join(cache_dir, f"audio_truth_n{n}_s{seed}.parquet")
    if not (os.path.exists(aud_path) and os.path.exists(truth_path)):
        audio, truth = generate_audio(n, seed)
        pq.write_table(audio, aud_path + ".tmp", row_group_size=1024)
        pq.write_table(truth, truth_path + ".tmp", row_group_size=65536)
        os.replace(aud_path + ".tmp", aud_path)
        os.replace(truth_path + ".tmp", truth_path)
    return aud_path, truth_path


def videos_parquet(
    n: int, seed: int = 7, cache_dir: str = "/tmp/tdr_corpus"
) -> tuple[str, str]:
    """Generate (or reuse a cached) video corpus; returns (videos_path,
    truth_path). Cache key (n, seed); generation is deterministic."""
    os.makedirs(cache_dir, exist_ok=True)
    vids_path = os.path.join(cache_dir, f"videos_n{n}_s{seed}.parquet")
    truth_path = os.path.join(cache_dir, f"videos_truth_n{n}_s{seed}.parquet")
    if not (os.path.exists(vids_path) and os.path.exists(truth_path)):
        videos, truth = generate_videos(n, seed)
        pq.write_table(videos, vids_path + ".tmp", row_group_size=1024)
        pq.write_table(truth, truth_path + ".tmp", row_group_size=65536)
        os.replace(vids_path + ".tmp", vids_path)
        os.replace(truth_path + ".tmp", truth_path)
    return vids_path, truth_path
