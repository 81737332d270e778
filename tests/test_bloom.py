"""Sharded Bloom dedup: parity with a sequential per-shard reference walk
(reference bloom_filter.py:23-47 semantics), FP behavior under a tiny filter,
and exact-dedup agreement at a tight error rate."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.bloom import (
    _positions,
    bloom_dedup,
    bloom_params,
)


def _corpus(n: int, seed: int, dup_frac: float = 0.4) -> pa.Table:
    rng = np.random.RandomState(seed)
    base = [
        f"doc {i} " + " ".join(f"w{j}" for j in rng.randint(0, 40, 6))
        for i in range(max(2, int(n * (1 - dup_frac))))
    ]
    texts = [base[rng.randint(0, len(base))] for _ in range(n)]
    return pa.table({"row_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})


def _digest(text: str) -> bytes:
    return hashlib.sha1(text.encode("utf-8")).digest()[:16]


def _shard_of(digest: bytes, num_shards: int) -> int:
    # int() BEFORE the modulo: np.uint64 % python-int promotes to float64
    return int(np.frombuffer(digest[:8], dtype=np.uint64)[0]) % num_shards


def _sequential_flags(table: pa.Table, num_shards: int, m: int, k: int) -> dict[int, bool]:
    """Reference walk: per shard, rows in row_id order through a plain bloom
    (check all k positions; add only on miss)."""
    rows = sorted(
        zip(table["row_id"].to_pylist(), table["text"].to_pylist()), key=lambda x: x[0]
    )
    bits: dict[int, set[int]] = {s: set() for s in range(num_shards)}
    flags: dict[int, bool] = {}
    for rid, text in rows:
        d = _digest(text)
        s = _shard_of(d, num_shards)
        h = np.frombuffer(d, dtype="V16")
        pos = _positions(h, m, k)[0].tolist()
        if all(p in bits[s] for p in pos):
            flags[rid] = True  # maybe-seen: flagged, never added
        else:
            flags[rid] = False
            bits[s].update(pos)
    return flags


def _flag_map(ds: ray.data.Dataset) -> dict[int, bool]:
    return {
        r["row_id"]: r["duplicate"]
        for r in ds.select_columns(["row_id", "duplicate"]).take_all()
    }


class TestBloomDedup:
    def test_params_match_standard_formulas(self):
        m, k = bloom_params(1000, 0.01)
        assert 9500 <= m <= 9700 and k == 7  # canonical n=1000,p=.01 sizing

    def test_tight_error_rate_equals_exact_first_occurrence(self):
        t = _corpus(500, seed=11)
        got = sorted(
            r["row_id"]
            for r in bloom_dedup(
                ray.data.from_arrow(t), max_elements=1000, error_rate=1e-12
            ).take_all()
        )
        df = t.to_pandas()
        want = sorted(df.groupby("text")["row_id"].min())
        assert got == want

    def test_sequential_parity_under_tiny_filter(self):
        # 64-bit shards, k=1: false positives are guaranteed at 300 distinct
        # texts — the distributed flags must still equal the per-shard
        # sequential walk bit-for-bit.
        t = _corpus(400, seed=7, dup_frac=0.2)
        num_shards = 2
        flagged = bloom_dedup(
            ray.data.from_arrow(t),
            max_elements=1,
            error_rate=0.5,
            num_shards=num_shards,
            keep_flag=True,
        )
        got = _flag_map(flagged)
        want = _sequential_flags(t, num_shards, m=64, k=1)
        assert got == want
        assert sum(got.values()) > 0

    def test_fp_flags_are_superset_of_true_dups_and_fp_exists(self):
        t = _corpus(400, seed=13, dup_frac=0.3)
        got = _flag_map(
            bloom_dedup(
                ray.data.from_arrow(t),
                max_elements=1,
                error_rate=0.5,
                num_shards=2,
                keep_flag=True,
            )
        )
        df = t.to_pandas()
        first = df.groupby("text")["row_id"].min()
        true_dup = {int(r.row_id): r.text for r in df.itertuples() if r.row_id != first[r.text]}
        for rid in true_dup:
            assert got[rid], "a true repeat must always be flagged"
        n_fp = sum(1 for rid, f in got.items() if f and rid not in true_dup)
        assert n_fp > 0, "tiny filter must produce false positives"

    def test_deterministic_across_runs_and_shard_counts_at_tight_rate(self):
        t = _corpus(300, seed=17)
        runs = [
            sorted(
                r["row_id"]
                for r in bloom_dedup(
                    ray.data.from_arrow(t),
                    max_elements=1000,
                    error_rate=1e-12,
                    num_shards=s,
                ).take_all()
            )
            for s in (1, 4, 4)
        ]
        assert runs[0] == runs[1] == runs[2]

    def test_keep_flag_preserves_every_row(self):
        t = _corpus(200, seed=19)
        out = bloom_dedup(
            ray.data.from_arrow(t), max_elements=500, error_rate=1e-9, keep_flag=True
        )
        assert out.count() == 200
        assert "duplicate" in out.schema().names

    def test_tiered_equals_batch_walk_including_false_positives(self, tmp_path):
        # tiny filter: FPs guaranteed — the resumed walk must still equal the
        # single batch walk bit-for-bit (literal register-state equality)
        from text_dedup_ray.pipelines.bloom import bloom_bootstrap, bloom_increment

        t = _corpus(400, seed=23, dup_frac=0.2)
        batch = _flag_map(
            bloom_dedup(
                ray.data.from_arrow(t),
                max_elements=1,
                error_rate=0.5,
                num_shards=2,
                keep_flag=True,
            )
        )
        state = str(tmp_path / "state")
        boot = bloom_bootstrap(
            ray.data.from_arrow(t.slice(0, 150)), state,
            max_elements=1, error_rate=0.5, num_shards=2,
        )
        inc1 = bloom_increment(ray.data.from_arrow(t.slice(150, 100)), state)
        inc2 = bloom_increment(ray.data.from_arrow(t.slice(250)), state)
        got = {**_flag_map(boot.flagged), **_flag_map(inc1.flagged), **_flag_map(inc2.flagged)}
        assert got == batch
        assert inc2.state_version == 3

    def test_tiered_survivors_match_exact_at_tight_rate(self, tmp_path):
        from text_dedup_ray.pipelines.bloom import bloom_bootstrap, bloom_increment

        t = _corpus(300, seed=29)
        state = str(tmp_path / "state")
        boot = bloom_bootstrap(
            ray.data.from_arrow(t.slice(0, 200)), state,
            max_elements=1000, error_rate=1e-12, num_shards=4,
        )
        inc = bloom_increment(ray.data.from_arrow(t.slice(200)), state)
        got = sorted(
            [r["row_id"] for r in boot.deduped.take_all()]
            + [r["row_id"] for r in inc.deduped.take_all()]
        )
        df = t.to_pandas()
        assert got == sorted(df.groupby("text")["row_id"].min())

    def test_tiered_rejects_out_of_order_ids_and_config_drift(self, tmp_path):
        import pytest

        from text_dedup_ray.pipelines.bloom import bloom_bootstrap, bloom_increment

        t = _corpus(100, seed=31)
        state = str(tmp_path / "state")
        bloom_bootstrap(ray.data.from_arrow(t.slice(50)), state, max_elements=100)
        with pytest.raises(ValueError, match="row ids must exceed"):
            bloom_increment(ray.data.from_arrow(t.slice(0, 50)), state)
        with pytest.raises(ValueError, match="different text column"):
            bloom_increment(
                ray.data.from_arrow(
                    t.slice(0, 50).rename_columns(["row_id", "other"]).append_column(
                        "text", t.slice(0, 50)["text"]
                    )
                ),
                state,
                text_column="other",
            )

    def test_single_row_and_all_identical(self):
        one = pa.table({"row_id": pa.array([0], pa.int64()), "text": pa.array(["x"])})
        assert bloom_dedup(ray.data.from_arrow(one), max_elements=10).count() == 1
        same = pa.table(
            {"row_id": pa.array(range(50), pa.int64()), "text": pa.array(["same"] * 50)}
        )
        got = bloom_dedup(ray.data.from_arrow(same), max_elements=10).take_all()
        assert [r["row_id"] for r in got] == [0]
