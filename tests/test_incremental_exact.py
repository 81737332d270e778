"""Incremental exact dedup: bootstrap + increments must equal a full batch
exact_dedup run over the combined corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.exact import exact_dedup
from text_dedup_ray.pipelines.incremental_exact import exact_bootstrap, exact_increment


def _corpus(n: int, seed: int, dup_frac: float = 0.3) -> pa.Table:
    rng = np.random.RandomState(seed)
    base = [f"doc {i} body " + " ".join(f"w{j}" for j in rng.randint(0, 50, 8))
            for i in range(max(2, int(n * (1 - dup_frac))))]
    texts = [base[rng.randint(0, len(base))] for _ in range(n)]
    return pa.table(
        {"row_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
    )


def _ids(ds: ray.data.Dataset) -> list[int]:
    return sorted(r["row_id"] for r in ds.select_columns(["row_id"]).take_all())


class TestExactIncremental:
    def test_single_increment_equals_full_batch(self, tmp_path):
        t = _corpus(300, seed=3)
        half = 150
        full = exact_dedup(ray.data.from_arrow(t))
        state = str(tmp_path / "state")
        boot = exact_bootstrap(ray.data.from_arrow(t.slice(0, half)), state)
        inc = exact_increment(ray.data.from_arrow(t.slice(half)), state)
        got = sorted(_ids(boot.deduped) + _ids(inc.deduped))
        assert got == _ids(full)

    def test_chained_increments(self, tmp_path):
        t = _corpus(400, seed=5)
        full = exact_dedup(ray.data.from_arrow(t))
        state = str(tmp_path / "state")
        cuts = [0, 100, 250, 400]
        boot = exact_bootstrap(
            ray.data.from_arrow(t.slice(cuts[0], cuts[1] - cuts[0])), state
        )
        survivors = _ids(boot.deduped)
        ver = boot.state_version
        for a, b in zip(cuts[1:], cuts[2:]):
            inc = exact_increment(ray.data.from_arrow(t.slice(a, b - a)), state)
            survivors += _ids(inc.deduped)
            assert inc.state_version == ver + 1
            ver = inc.state_version
        assert sorted(survivors) == _ids(full)

    def test_forced_distributed_matches(self, tmp_path):
        t = _corpus(300, seed=7)
        half = 150
        full = exact_dedup(ray.data.from_arrow(t))
        state = str(tmp_path / "state")
        boot = exact_bootstrap(
            ray.data.from_arrow(t.slice(0, half)), state, driver_threshold=0
        )
        assert isinstance(boot.parents, ray.data.Dataset)
        inc = exact_increment(
            ray.data.from_arrow(t.slice(half)), state, driver_threshold=0
        )
        assert isinstance(inc.parents, ray.data.Dataset)
        got = sorted(_ids(boot.deduped) + _ids(inc.deduped))
        assert got == _ids(full)

    def test_id_validation(self, tmp_path):
        t = _corpus(100, seed=9)
        state = str(tmp_path / "state")
        exact_bootstrap(ray.data.from_arrow(t), state)
        with pytest.raises(ValueError, match="max_row_id"):
            exact_increment(ray.data.from_arrow(t.slice(0, 10)), state)

    def test_assignments_point_at_old_winners(self, tmp_path):
        a = pa.table({"row_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["alpha text here", "beta text here"])})
        b = pa.table({"row_id": pa.array([10, 11], pa.int64()),
                      "text": pa.array(["alpha text here", "gamma text here"])})
        state = str(tmp_path / "state")
        exact_bootstrap(ray.data.from_arrow(a), state)
        inc = exact_increment(ray.data.from_arrow(b), state)
        asg = {r["row_id"]: r["__CLUSTER__"] for r in inc.assigned.take_all()}
        assert asg == {10: 0, 11: 11}  # 10 joins old winner 0; 11 is fresh
        assert _ids(inc.deduped) == [11]

    def test_empty_increment(self, tmp_path):
        t = _corpus(50, seed=11)
        state = str(tmp_path / "state")
        exact_bootstrap(ray.data.from_arrow(t), state)
        inc = exact_increment(ray.data.from_arrow(t.slice(0, 0)), state)
        assert inc.deduped.count() == 0
