"""Tiered fused dedup == batch multimodal_dedup over old ∪ new (the
union-CC composition of the two per-family tiered states)."""

from __future__ import annotations

import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from text_dedup_ray.functions.minhash import MinHashConfig
from text_dedup_ray.pipelines.images import (
    image_ids_to_row_ids,
    multimodal_dedup,
    multimodal_merge_cluster_maps,
    phash_bootstrap,
    phash_increment,
)
from text_dedup_ray.pipelines.incremental import minhash_bootstrap, minhash_increment
from text_dedup_ray.sources.io import ROW_ID

CFG = MinHashConfig(num_perm=32, bands=8, rows=4, ngram_size=2, hash_func="sha1")


def test_tiered_fused_equals_batch(tmp_path):
    from text_dedup_ray.data.gen import corpus_parquet

    path, _ = corpus_parquet(1000, seed=42)
    ds = image_ids_to_row_ids(ray.data.read_parquet(path))
    batch = sorted(
        multimodal_dedup(ds=ds, cfg=CFG, bit_diff=2, num_bucket=4)
        .to_pandas()["image_id"]
        .tolist()
    )

    cut = int(ds.max(ROW_ID) * 0.8)

    def split(keep_old: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.less_equal(t[ROW_ID], pa.scalar(cut, pa.int64()))
            return t.filter(m if keep_old else pc.invert(m))

        return f

    s_mh = tempfile.mkdtemp(prefix="t_mm_lsh_", dir=str(tmp_path))
    minhash_bootstrap(
        ds.map_batches(split(True), batch_format="pyarrow"),
        s_mh, text_column="caption", cfg=CFG, num_partitions=8,
    )
    inc_mh = minhash_increment(
        ds.map_batches(split(False), batch_format="pyarrow"),
        s_mh, text_column="caption", cfg=CFG,
    )
    s_ph = tempfile.mkdtemp(prefix="t_mm_ph_", dir=str(tmp_path))
    narrow = ds.select_columns([ROW_ID, "phash"])
    phash_bootstrap(
        narrow.map_batches(split(True), batch_format="pyarrow"),
        s_ph, bit_diff=2, num_bucket=4, num_partitions=8,
    )
    inc_ph = phash_increment(
        narrow.map_batches(split(False), batch_format="pyarrow"),
        s_ph, bit_diff=2, num_bucket=4,
    )
    tiered = sorted(
        multimodal_merge_cluster_maps(
            ds,
            [
                ray.data.read_parquet(f"{s_mh}/v{inc_mh.state_version:05d}/clusters"),
                ray.data.read_parquet(f"{s_ph}/v{inc_ph.state_version:05d}/clusters"),
            ],
        )
        .to_pandas()["image_id"]
        .tolist()
    )
    assert tiered == batch
    assert 0 < len(batch) < 1000  # the fusion genuinely dedups
