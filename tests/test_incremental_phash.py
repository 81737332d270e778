"""Tiered phash (image near-dup) dedup: bootstrap/increment over the stored
64-bit perceptual hash must land on EXACTLY the cluster map a full
``phash_near_dedup_parents`` re-run produces — including cross-batch
near-dups (<= bit_diff flips), new-new dups, and a new image bridging two
old clusters."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from text_dedup_ray.pipelines.images import (
    phash_bootstrap,
    phash_increment,
    phash_near_dedup_parents,
)

BIT_DIFF = 2
NUM_BUCKET = 4


def _tbl(ids, phashes):
    return pa.table(
        {
            "row_id": pa.array([int(i) for i in ids], pa.int64()),
            "phash": pa.array([int(p) for p in phashes], pa.int64()),
        }
    )


def _flip(p: int, bits: tuple[int, ...]) -> int:
    u = int(p) & 0xFFFFFFFFFFFFFFFF
    for b in bits:
        u ^= 1 << b
    return u - (1 << 64) if u >= 1 << 63 else u


def _corpus():
    """40 old images with two planted near-dup pairs; new images with an
    old near-dup, a new-new pair, and uniques. Base hashes are far apart
    (random 64-bit), planted dups differ by <= BIT_DIFF bits."""
    rng = np.random.RandomState(9)
    base = rng.randint(-(2**62), 2**62, size=40, dtype=np.int64)
    old = base.copy()
    old[7] = _flip(int(old[3]), (5,))        # 1-bit flip -> near-dup of 3
    old[25] = _flip(int(old[11]), (17, 40))  # 2-bit flip -> near-dup of 11
    old_ids = list(range(40))
    new_ph = [
        _flip(int(old[3]), (60,)),           # near-dup of old cluster 3
        int(rng.randint(-(2**62), 2**62)),   # unique
        int(rng.randint(-(2**62), 2**62)),   # unique, dup'd next row
    ]
    new_ph.append(_flip(new_ph[2], (1, 2)))  # new-new near-dup pair
    new_ids = [100 + i for i in range(len(new_ph))]
    return old_ids, old, new_ids, new_ph


def _nontrivial(parents) -> dict[int, int]:
    if isinstance(parents, ray.data.Dataset):
        df = parents.to_pandas()
        parents = dict(zip(df["row_id"], df["cluster_id"]))
    return {int(m): int(r) for m, r in parents.items() if m != r}


def _state_clusters(state_dir: str, version: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for f in glob.glob(f"{state_dir}/v{version:05d}/clusters/*.parquet"):
        t = pq.read_table(f)
        out.update(zip(t["row_id"].to_pylist(), t["cluster_id"].to_pylist()))
    return out


def _full(old_ids, old, new_ids, new_ph):
    both = pa.concat_tables([_tbl(old_ids, old), _tbl(new_ids, new_ph)])
    return phash_near_dedup_parents(
        ray.data.from_arrow(both), bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET
    )


class TestPhashIncremental:
    def test_single_increment_equals_full_batch(self, tmp_path):
        old_ids, old, new_ids, new_ph = _corpus()
        full = _full(old_ids, old, new_ids, new_ph)
        state = str(tmp_path / "state")
        phash_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old)), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET, num_partitions=8,
        )
        inc = phash_increment(
            ray.data.from_arrow(_tbl(new_ids, new_ph)), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET,
        )
        got = _state_clusters(state, inc.state_version)
        assert got == _nontrivial(full)
        assert got[100] == 3  # cross-batch near-dup found
        assert got[103] == 102  # new-new pair

    def test_chained_and_forced_distributed(self, tmp_path):
        old_ids, old, new_ids, new_ph = _corpus()
        full = _full(old_ids, old, new_ids, new_ph)
        state = str(tmp_path / "state")
        phash_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old)), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET,
            num_partitions=8, driver_threshold=0,
        )
        inc1 = phash_increment(
            ray.data.from_arrow(_tbl(new_ids[:2], new_ph[:2])), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET, driver_threshold=0,
        )
        inc2 = phash_increment(
            ray.data.from_arrow(_tbl(new_ids[2:], new_ph[2:])), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET, driver_threshold=0,
        )
        assert isinstance(inc2.parents, ray.data.Dataset)
        assert _state_clusters(state, inc2.state_version) == _nontrivial(full)
        assert inc2.state_version == inc1.state_version + 1

    def test_bridge_merges_old_clusters(self, tmp_path):
        old_ids, old, _, _ = _corpus()
        # bridge geometry: new hash is 1 bit from old[7] (in cluster {3,7})
        # and 2 bits from old[30]; old[30] sits 3 bits from old[7], so the
        # two old clusters are disjoint until the bridging image arrives
        old = old.copy()
        bridge = _flip(int(old[7]), (33,))
        old[30] = _flip(int(bridge), (44, 45))
        full = _full(old_ids, old, [200], [bridge])
        state = str(tmp_path / "state")
        boot = phash_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old)), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET, num_partitions=8,
        )
        before = _nontrivial(boot.parents)
        assert 30 not in before  # not yet merged with {3,7}
        inc = phash_increment(
            ray.data.from_arrow(_tbl([200], [bridge])), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET,
        )
        assert _state_clusters(state, inc.state_version) == _nontrivial(full)
        assert inc.merged_old_roots  # bridging merged two old clusters

    def test_cfg_guard(self, tmp_path):
        old_ids, old, new_ids, new_ph = _corpus()
        state = str(tmp_path / "state")
        phash_bootstrap(
            ray.data.from_arrow(_tbl(old_ids, old)), state,
            bit_diff=BIT_DIFF, num_bucket=NUM_BUCKET,
        )
        import pytest

        with pytest.raises(ValueError, match="different SimHash config"):
            phash_increment(
                ray.data.from_arrow(_tbl(new_ids, new_ph)), state,
                bit_diff=3, num_bucket=NUM_BUCKET,
            )
