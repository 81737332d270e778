"""Video near-duplicate detection over frame-level perceptual hashes.

Extends the image family (pipelines/images.py) to the video modality the
same way the reference treats every payload — as opaque binary with typed
metadata (reference has no video support at all; this is part of the
engine's multimodal surface). The only decodable container here is the
deterministic ``rawv`` format (concatenated w*h-byte grayscale frames,
see images.FrameSampleStage); real codecs would slot into the same actor
stage.

Semantics: a video's signature is the DISTINCT SET of sampled-frame
average_phash values; two videos are near-duplicates when the exact
Jaccard of those sets >= threshold. Trimmed copies (frame subsets) and
lightly re-edited copies (a few frames replaced) stay above threshold;
unrelated videos share essentially no 64-bit frame hashes.

Scale stance (the image-family rule, applied to the much wider payload):
video BYTES never enter a shuffle. One fused actor stage decodes, samples
(every_n), hashes and DISTINCTs each video's frames locally — a video row
never splits across batches, so the per-video set needs no exchange — and
emits only (phash, row_id, set_size) postings, 24 bytes per distinct
frame. Candidate pairing + exact Jaccard + connected components then
reuse the text machinery verbatim (pipelines/jaccard_dedup.
pairs_from_postings + stages/cc) — the set element is any 64-bit value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.codecs import average_phash_stack
from ..sources.io import ROW_ID
from .jaccard_dedup import pairs_from_postings

VIDEO_META_COLUMNS = ["video_id", "bytes", "fmt", "n_frames", "w", "h"]


def video_ids_to_row_ids(
    ds: ray.data.Dataset, id_column: str = "video_id"
) -> ray.data.Dataset:
    """'vid-%09d' string keys -> deterministic int64 row_id (the image
    family's natural-key stamp, images.image_ids_to_row_ids)."""
    import pyarrow.compute as pc

    def add(batch: pa.Table) -> pa.Table:
        digits = pc.utf8_slice_codeunits(batch[id_column], 4)
        return batch.append_column(ROW_ID, pc.cast(digits, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def _decode_rawv(blob: bytes, nf: int, w: int, h: int, fmt: str, vid) -> np.ndarray:
    if fmt != "rawv":
        # pluggable real-codec seam: a PyAV adapter registered in
        # functions.codecs decodes MP4/WebM here; sandbox has no wheel
        from ..functions.codecs import get_video_decoder

        adapter = get_video_decoder(fmt)
        if adapter is None:
            raise NotImplementedError(
                f"video format {fmt!r} unavailable: no codec wheel registered "
                "an adapter (pip install av, or register_video_decoder)"
            )
        frames = adapter(blob, {"n_frames": nf, "w": w, "h": h, "id": vid})
        return np.ascontiguousarray(frames, dtype=np.uint8)
    if len(blob) != nf * w * h:
        raise ValueError(
            f"video {vid}: payload {len(blob)}B != n_frames*w*h ({nf}*{w}*{h})"
        )
    return np.frombuffer(blob, dtype=np.uint8).reshape(nf, h, w)


class VideoPhashPostingsStage:
    """Actor pool: fused decode -> frame-sample -> phash -> per-video
    DISTINCT -> postings.

    Emits ``(sh:int64, row_id:int64, size:int64, part:int64)`` — the
    pairs_from_postings contract — where ``sh`` is a sampled frame's
    average_phash and ``size`` the video's distinct-hash count. Payload
    decode is per row by nature; the hash itself is vectorized across each
    video's frame stack (average_phash_stack). Small batches: video
    payloads are wide (guide: memory-aware batching).
    """

    def __init__(self, every_n: int = 1, num_partitions: int = 32) -> None:
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        nfs = batch["n_frames"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        vids = batch["video_id"].to_pylist() if "video_id" in batch.column_names else ids
        hash_chunks: list[np.ndarray] = []
        id_chunks: list[np.ndarray] = []
        sz_chunks: list[np.ndarray] = []
        for rid, vid, blob, fmt, nf, w, h in zip(ids, vids, blobs, fmts, nfs, ws, hs):
            frames = _decode_rawv(blob, nf, w, h, fmt, vid)[:: self.every_n]
            distinct = np.unique(average_phash_stack(frames))
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


def video_phash_postings(
    ds: ray.data.Dataset,
    every_n: int = 1,
    num_partitions: int = 32,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Frame-phash postings for a video dataset (must carry ``row_id``)."""
    return ds.map_batches(
        VideoPhashPostingsStage,
        fn_constructor_args=(every_n, num_partitions),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def video_near_dedup(
    ds: ray.data.Dataset,
    every_n: int = 1,
    threshold: float = 0.5,
    id_column: str = "video_id",
    num_partitions: int = 32,
    df_cap: int = 10_000,
    driver_threshold: int = 2_000_000,
    **stage_kwargs,
):
    """Cluster map of near-duplicate videos (frame-phash-set Jaccard >=
    threshold, min-id roots). Returns a dict below ``driver_threshold``
    reduced edges, else a Dataset (row_id, cluster_id) — the shared
    automatic distributed-CC fallback.

    ``df_cap`` bounds a frame hash shared by pathologically many videos
    (e.g. an all-black frame); drops are logged by the pair stage, not
    silent. The default is high because legitimate intros/outros are the
    point of frame-level matching."""
    from ..stages.cc import connected_components_auto

    if ROW_ID not in ds.schema().names:
        ds = video_ids_to_row_ids(ds, id_column)
    postings = video_phash_postings(
        ds, every_n=every_n, num_partitions=num_partitions, **stage_kwargs
    )
    pairs = pairs_from_postings(postings, threshold, num_partitions, df_cap)
    edges = pairs.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    )
    return connected_components_auto(edges, driver_threshold=driver_threshold)


class VideoFrameStatsStage:
    """Actor pool: per-video decode statistics — the video analogue of
    images.ImageDecodeStage. Output: (video_id, n_frames, n_sampled,
    n_distinct_phash)."""

    def __init__(self, every_n: int = 1) -> None:
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["video_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        nfs = batch["n_frames"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n_sampled = np.empty(len(vids), dtype=np.int64)
        n_distinct = np.empty(len(vids), dtype=np.int64)
        for i, (vid, blob, fmt, nf, w, h) in enumerate(
            zip(vids, blobs, fmts, nfs, ws, hs)
        ):
            frames = _decode_rawv(blob, nf, w, h, fmt, vid)[:: self.every_n]
            n_sampled[i] = len(frames)
            n_distinct[i] = len(np.unique(average_phash_stack(frames)))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "n_frames": pa.array(np.asarray(nfs, dtype=np.int64), pa.int64()),
                "n_sampled": pa.array(n_sampled),
                "n_distinct_phash": pa.array(n_distinct),
            }
        )


def video_frame_stats(
    ds: ray.data.Dataset,
    every_n: int = 1,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Per-video decode statistics (actor pool, small batches — payloads
    are wide): (video_id, n_frames, n_sampled, n_distinct_phash)."""
    return ds.map_batches(
        VideoFrameStatsStage,
        fn_constructor_args=(every_n,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
