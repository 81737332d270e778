"""Incremental (tiered) AUDIO near-dup against a saved window-fingerprint
posting index — the audio member of the tiered contract, instantiating the
family-agnostic posting-index machinery exactly like the video family
(pipelines/incremental_video.py): the set element is a 1024-sample
window's 64-bit fingerprint. Audio bytes never shuffle in a bootstrap OR
an increment; full-rerun equivalence is asserted by
tests/test_audio_dedup.py."""

from __future__ import annotations

import ray.data

from ..sources.io import ROW_ID
from ..state.checkpoint import config_hash
from .audio import audio_fingerprint_postings, audio_ids_to_row_ids, audio_near_dedup
from .incremental import IncrementResult, load_meta
from .incremental_jaccard import posting_state_bootstrap, posting_state_increment

_ALGO = "audio_fp_posting"


def _aud_cfg_hash(threshold: float, num_partitions: int) -> str:
    return config_hash(
        {"algo": _ALGO, "threshold": threshold, "num_partitions": num_partitions}
    )


def _with_row_ids(ds: ray.data.Dataset, id_column: str) -> ray.data.Dataset:
    if ROW_ID in ds.schema().names:
        return ds
    return audio_ids_to_row_ids(ds, id_column)


def audio_bootstrap(
    ds: ray.data.Dataset,
    state_dir: str,
    threshold: float = 0.5,
    id_column: str = "audio_id",
    num_partitions: int = 32,
    df_cap: int = 10_000,
    driver_threshold: int = 2_000_000,
) -> IncrementResult:
    """Full window-fingerprint-set Jaccard dedup over the initial audio
    corpus, persisting the posting index + cluster rows + meta."""
    ds = _with_row_ids(ds, id_column)
    return posting_state_bootstrap(
        ds,
        state_dir,
        postings_of=lambda d: audio_fingerprint_postings(
            d, num_partitions=num_partitions
        ),
        parents_of=lambda d: audio_near_dedup(
            d, threshold=threshold, num_partitions=num_partitions,
            df_cap=df_cap, driver_threshold=driver_threshold,
        ),
        meta_fields={
            "algo": _ALGO,
            "cfg_hash": _aud_cfg_hash(threshold, num_partitions),
            "threshold": threshold,
            "df_cap": df_cap,
        },
        num_partitions=num_partitions,
        driver_threshold=driver_threshold,
    )


def audio_increment(
    new_ds: ray.data.Dataset,
    state_dir: str,
    id_column: str = "audio_id",
    driver_threshold: int = 2_000_000,
    validate_ids: bool = True,
) -> IncrementResult:
    """Dedup new tracks against the saved fingerprint index AND themselves;
    persist the next version. Cluster assignments equal a full batch
    ``audio_near_dedup`` over old ∪ new."""
    meta = load_meta(state_dir)
    if meta.get("algo") != _ALGO:
        raise ValueError(f"state at {state_dir} is not a {_ALGO} index")
    new_ds = _with_row_ids(new_ds, id_column)
    return posting_state_increment(
        new_ds,
        state_dir,
        meta,
        postings_of=lambda d: audio_fingerprint_postings(
            d, num_partitions=int(meta["num_partitions"])
        ),
        driver_threshold=driver_threshold,
        validate_ids=validate_ids,
    )
