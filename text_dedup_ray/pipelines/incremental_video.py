"""Incremental (tiered) VIDEO near-dup against a saved frame-phash posting
index — the video member of the tiered contract (exact/minhash/simhash/
phash/embedding/suffix/jaccard are in their own modules).

Thin instantiation of the family-agnostic posting-index machinery
(pipelines/incremental_jaccard.posting_state_bootstrap / _increment): the
set element is a sampled frame's 64-bit average_phash instead of a shingle
hash, produced by the same fused decode stage batch dedup uses
(pipelines/video.VideoPhashPostingsStage — video bytes never shuffle, in
an increment OR a bootstrap). Equivalence with a full batch re-run over
old ∪ new follows from the shared machinery's (new x old) ∪ (new x new)
pair emission + prior-map composition, asserted by
tests/test_incremental_video.py.
"""

from __future__ import annotations

import ray.data

from ..sources.io import ROW_ID
from ..state.checkpoint import config_hash
from .incremental import IncrementResult, load_meta
from .incremental_jaccard import posting_state_bootstrap, posting_state_increment
from .video import video_ids_to_row_ids, video_near_dedup, video_phash_postings

_ALGO = "video_phash_posting"


def _vid_cfg_hash(every_n: int, threshold: float, num_partitions: int) -> str:
    return config_hash(
        {
            "algo": _ALGO,
            "every_n": every_n,
            "threshold": threshold,
            "num_partitions": num_partitions,
        }
    )


def _with_row_ids(ds: ray.data.Dataset, id_column: str) -> ray.data.Dataset:
    if ROW_ID in ds.schema().names:
        return ds
    return video_ids_to_row_ids(ds, id_column)


def video_bootstrap(
    ds: ray.data.Dataset,
    state_dir: str,
    every_n: int = 1,
    threshold: float = 0.5,
    id_column: str = "video_id",
    num_partitions: int = 32,
    df_cap: int = 10_000,
    driver_threshold: int = 2_000_000,
) -> IncrementResult:
    """Full frame-phash-set Jaccard dedup over the initial video corpus,
    persisting the posting index + cluster rows + meta to ``state_dir``."""
    ds = _with_row_ids(ds, id_column)
    return posting_state_bootstrap(
        ds,
        state_dir,
        postings_of=lambda d: video_phash_postings(
            d, every_n=every_n, num_partitions=num_partitions
        ),
        parents_of=lambda d: video_near_dedup(
            d, every_n=every_n, threshold=threshold,
            num_partitions=num_partitions, df_cap=df_cap,
            driver_threshold=driver_threshold,
        ),
        meta_fields={
            "algo": _ALGO,
            "cfg_hash": _vid_cfg_hash(every_n, threshold, num_partitions),
            "every_n": every_n,
            "threshold": threshold,
            "df_cap": df_cap,
        },
        num_partitions=num_partitions,
        driver_threshold=driver_threshold,
    )


def video_increment(
    new_ds: ray.data.Dataset,
    state_dir: str,
    id_column: str = "video_id",
    driver_threshold: int = 2_000_000,
    validate_ids: bool = True,
) -> IncrementResult:
    """Dedup new videos against the saved frame-phash index AND themselves;
    persist the next version. Cluster assignments equal a full batch
    ``video_near_dedup`` over old ∪ new. Sampling/threshold parameters come
    from the saved meta."""
    meta = load_meta(state_dir)
    if meta.get("algo") != _ALGO:
        raise ValueError(f"state at {state_dir} is not a {_ALGO} index")
    new_ds = _with_row_ids(new_ds, id_column)
    return posting_state_increment(
        new_ds,
        state_dir,
        meta,
        postings_of=lambda d: video_phash_postings(
            d,
            every_n=int(meta["every_n"]),
            num_partitions=int(meta["num_partitions"]),
        ),
        driver_threshold=driver_threshold,
        validate_ids=validate_ids,
    )
