"""Audio near-duplicate detection over window-level fingerprints.

Third modality of the postings-dedup machinery (text shingles →
pipelines/jaccard_dedup; video frame phashes → pipelines/video): an audio
track's signature is the DISTINCT SET of its window fingerprints, near-dup
iff exact set Jaccard >= threshold. Clipped copies (window suffixes
dropped) and lightly re-edited copies stay above threshold.

The only decodable container here is ``rawa`` — raw mono uint8 PCM (no
audio libs in this environment; a real decoder/chromaprint-style kernel
would slot into the same actor stage). The fingerprint kernel is the
engine's mean-threshold hash applied to each non-overlapping 1024-sample
window folded to 32x32 (functions/codecs.average_phash_stack) — a
deterministic stand-in with the exactness guarantees the SQL oracles
need; the Ray-side plumbing (schema, actor pool, postings contract,
tiered index) is the real deliverable.

Scale stance: audio BYTES never enter a shuffle — one fused actor stage
decodes, windows, hashes and DISTINCTs locally, emitting 24-byte
postings. A pathological window shared by everything (e.g. digital
silence) is bounded by ``df_cap`` with logged, never silent, drops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.codecs import average_phash_stack
from ..sources.io import ROW_ID
from .jaccard_dedup import pairs_from_postings

AUDIO_WINDOW = 1024  # samples per fingerprint window (folds to 32x32)
AUDIO_META_COLUMNS = ["audio_id", "bytes", "fmt", "n_samples", "sr"]


def audio_ids_to_row_ids(
    ds: ray.data.Dataset, id_column: str = "audio_id"
) -> ray.data.Dataset:
    """'aud-%09d' string keys -> deterministic int64 row_id."""
    import pyarrow.compute as pc

    def add(batch: pa.Table) -> pa.Table:
        digits = pc.utf8_slice_codeunits(batch[id_column], 4)
        return batch.append_column(ROW_ID, pc.cast(digits, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def _decode_rawa(blob: bytes, n_samples: int, fmt: str, aid) -> np.ndarray:
    if fmt != "rawa":
        # pluggable real-codec seam: a PyAV adapter registered in
        # functions.codecs decodes FLAC/OGG here; sandbox has no wheel
        from ..functions.codecs import get_audio_decoder

        adapter = get_audio_decoder(fmt)
        if adapter is None:
            raise NotImplementedError(
                f"audio format {fmt!r} unavailable: no codec wheel registered "
                "an adapter (pip install av, or register_audio_decoder)"
            )
        pcm = adapter(blob, {"n_samples": n_samples, "id": aid})
        return np.ascontiguousarray(pcm, dtype=np.uint8)
    if len(blob) != n_samples:
        raise ValueError(
            f"audio {aid}: payload {len(blob)}B != n_samples ({n_samples})"
        )
    return np.frombuffer(blob, dtype=np.uint8)


def window_fingerprints(pcm: np.ndarray) -> np.ndarray:
    """64-bit fingerprint per complete non-overlapping AUDIO_WINDOW-sample
    window: fold to 32x32, mean-threshold hash. A trailing partial window
    is dropped (both here and in the generator's ground truth)."""
    n_win = len(pcm) // AUDIO_WINDOW
    if n_win == 0:
        return np.empty(0, dtype=np.int64)
    folded = pcm[: n_win * AUDIO_WINDOW].reshape(n_win, 32, 32)
    return average_phash_stack(folded)


class AudioFingerprintPostingsStage:
    """Actor pool: fused decode -> window -> fingerprint -> per-track
    DISTINCT -> ``(sh, row_id, size, part)`` postings (the
    pairs_from_postings contract). Small batches — audio payloads are wide
    (guide: memory-aware batching)."""

    def __init__(self, num_partitions: int = 32) -> None:
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        nss = batch["n_samples"].to_pylist()
        aids = batch["audio_id"].to_pylist() if "audio_id" in batch.column_names else ids
        hash_chunks, id_chunks, sz_chunks = [], [], []
        for rid, aid, blob, fmt, ns in zip(ids, aids, blobs, fmts, nss):
            pcm = _decode_rawa(blob, ns, fmt, aid)
            distinct = np.unique(window_fingerprints(pcm))
            hash_chunks.append(distinct)
            id_chunks.append(np.full(len(distinct), rid, dtype=np.int64))
            sz_chunks.append(np.full(len(distinct), len(distinct), dtype=np.int64))
        sh = (
            np.concatenate(hash_chunks).astype(np.int64)
            if hash_chunks
            else np.empty(0, np.int64)
        )
        rid_out = np.concatenate(id_chunks) if id_chunks else np.empty(0, np.int64)
        sz = np.concatenate(sz_chunks) if sz_chunks else np.empty(0, np.int64)
        part = (np.abs(sh) % np.int64(self.num_partitions)).astype(np.int64)
        return pa.table({"sh": sh, "row_id": rid_out, "size": sz, "part": part})


def audio_fingerprint_postings(
    ds: ray.data.Dataset,
    num_partitions: int = 32,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Window-fingerprint postings for an audio dataset (must carry
    ``row_id``)."""
    return ds.map_batches(
        AudioFingerprintPostingsStage,
        fn_constructor_args=(num_partitions,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_near_dedup(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    id_column: str = "audio_id",
    num_partitions: int = 32,
    df_cap: int = 10_000,
    driver_threshold: int = 2_000_000,
    **stage_kwargs,
):
    """Cluster map of near-duplicate audio tracks (window-fingerprint-set
    Jaccard >= threshold, min-id roots). Dict below ``driver_threshold``
    reduced edges, else a Dataset — the shared automatic distributed-CC
    fallback."""
    from ..stages.cc import connected_components_auto

    if ROW_ID not in ds.schema().names:
        ds = audio_ids_to_row_ids(ds, id_column)
    postings = audio_fingerprint_postings(
        ds, num_partitions=num_partitions, **stage_kwargs
    )
    pairs = pairs_from_postings(postings, threshold, num_partitions, df_cap)
    edges = pairs.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    )
    return connected_components_auto(edges, driver_threshold=driver_threshold)


class AudioWindowStatsStage:
    """Actor pool: per-track decode statistics — (audio_id, n_samples,
    n_windows, n_distinct_fp)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        aids = batch["audio_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        nss = batch["n_samples"].to_pylist()
        n_windows = np.empty(len(aids), dtype=np.int64)
        n_distinct = np.empty(len(aids), dtype=np.int64)
        for i, (aid, blob, fmt, ns) in enumerate(zip(aids, blobs, fmts, nss)):
            fp = window_fingerprints(_decode_rawa(blob, ns, fmt, aid))
            n_windows[i] = len(fp)
            n_distinct[i] = len(np.unique(fp))
        return pa.table(
            {
                "audio_id": pa.array(aids, pa.string()),
                "n_samples": pa.array(np.asarray(nss, dtype=np.int64), pa.int64()),
                "n_windows": pa.array(n_windows),
                "n_distinct_fp": pa.array(n_distinct),
            }
        )


def audio_window_stats(
    ds: ray.data.Dataset,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Per-track decode statistics (actor pool, small batches)."""
    return ds.map_batches(
        AudioWindowStatsStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
