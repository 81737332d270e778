"""grouped_top_k + deterministic hash sampling/splitting vs DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.pipelines.agg import grouped_top_k
from text_dedup_ray.pipelines.sample import (
    HASH_U32_SQL,
    hash_split,
    sample_by_hash,
    sample_per_group,
)

U32_EXPR = HASH_U32_SQL.format(expr="id::VARCHAR")


def _tbl(seed=5, n=2000, n_keys=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "g": pa.array(rng.choice([f"k{i}" for i in range(n_keys)], n)),
            "v": pa.array(rng.integers(0, 50, n), pa.int64()),
        }
    )


def _ds(tbl, blocks=5):
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestGroupedTopK:
    def _exp(self, tbl, k):
        con = duckdb.connect()
        con.register("t", tbl)
        return (
            con.execute(
                f"SELECT id, g, v, row_number() OVER "
                f"(PARTITION BY g ORDER BY v DESC, id ASC)::BIGINT AS rank "
                f"FROM t QUALIFY rank <= {k}"
            )
            .fetchdf()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )

    def _got(self, tbl, k, parts=8):
        out = grouped_top_k(
            _ds(tbl), "g", [("v", "descending"), ("id", "ascending")], k,
            num_partitions=parts,
        ).to_pandas()
        return out[["id", "g", "v", "rank"]].sort_values(["g", "rank"]).reset_index(
            drop=True
        )

    def test_matches_duckdb(self):
        tbl = _tbl()
        assert self._got(tbl, 3).equals(self._exp(tbl, 3))

    def test_k_exceeds_group_size(self):
        tbl = _tbl(seed=9, n=20, n_keys=6)
        assert self._got(tbl, 50, parts=3).equals(self._exp(tbl, 50))

    def test_partition_count_invariance(self):
        tbl = _tbl(seed=2)
        assert self._got(tbl, 4, parts=1).equals(self._got(tbl, 4, parts=13))

    def test_empty(self):
        empty = pa.table(
            {"id": pa.array([], pa.int64()), "g": pa.array([], pa.string()),
             "v": pa.array([], pa.int64())}
        )
        out = grouped_top_k(
            ray.data.from_arrow(empty), "g",
            [("v", "descending"), ("id", "ascending")], 3,
        ).to_pandas()
        assert len(out) == 0


class TestHashSplit:
    FR = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_matches_duckdb(self):
        tbl = _tbl(n=3000)
        got = (
            hash_split(_ds(tbl), "id", self.FR)
            .to_pandas()[["id", "split"]]
            .sort_values("id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = (
            con.execute(
                f"SELECT id, CASE WHEN {U32_EXPR} / 4294967296.0 < 0.8 THEN 'train' "
                f"WHEN {U32_EXPR} / 4294967296.0 < 0.9 THEN 'val' ELSE 'test' END AS split "
                f"FROM t ORDER BY id"
            )
            .fetchdf()
            .reset_index(drop=True)
        )
        assert got.equals(exp)
        counts = got.split.value_counts()
        assert 0.75 < counts["train"] / len(got) < 0.85

    def test_stable_under_repartition(self):
        tbl = _tbl(n=500)
        a = hash_split(_ds(tbl, 1), "id", self.FR).to_pandas().sort_values("id")
        b = hash_split(_ds(tbl, 11), "id", self.FR).to_pandas().sort_values("id")
        assert a.split.tolist() == b.split.tolist()

    def test_bad_fractions_raise(self):
        import pytest

        with pytest.raises(ValueError):
            hash_split(_ds(_tbl(n=10)), "id", {"a": 0.5, "b": 0.4})


class TestSampleByHash:
    def test_matches_duckdb_and_fraction(self):
        tbl = _tbl(n=5000)
        got = sample_by_hash(_ds(tbl), "id", 0.25).to_pandas().id.sort_values()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            f"SELECT id FROM t WHERE {U32_EXPR} < 0.25 * 4294967296.0 ORDER BY id"
        ).fetchdf().id
        assert got.tolist() == exp.tolist()
        assert 0.2 < len(got) / 5000 < 0.3

    def test_salts_decorrelate(self):
        tbl = _tbl(n=2000)
        a = set(sample_by_hash(_ds(tbl), "id", 0.3, salt="a").to_pandas().id)
        b = set(sample_by_hash(_ds(tbl), "id", 0.3, salt="b").to_pandas().id)
        overlap = len(a & b) / max(len(a), 1)
        assert 0.1 < overlap < 0.5  # ~0.3 expected under independence


class TestSamplePerGroup:
    def test_matches_duckdb(self):
        tbl = _tbl(n=1500, n_keys=5)
        got = (
            sample_per_group(_ds(tbl), "g", "id", 10)
            .to_pandas()[["g", "id"]]
            .sort_values(["g", "id"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = (
            con.execute(
                f"SELECT g, id FROM t QUALIFY row_number() OVER "
                f"(PARTITION BY g ORDER BY {U32_EXPR}, id) <= 10 "
                f"ORDER BY g, id"
            )
            .fetchdf()
            .reset_index(drop=True)
        )
        assert got.equals(exp)
        assert (got.groupby("g").size() == 10).all()

    def test_small_groups_keep_all(self):
        tbl = pa.table(
            {"id": pa.array(range(6), pa.int64()),
             "g": pa.array(["a"] * 2 + ["b"] * 4)}
        )
        got = sample_per_group(ray.data.from_arrow(tbl), "g", "id", 3).to_pandas()
        assert got.groupby("g").size().to_dict() == {"a": 2, "b": 3}


class TestSeededShuffle:
    def _ref_positions(self, ids, seed):
        import hashlib

        keyed = sorted(
            ids,
            key=lambda v: (
                int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:16], 16)
                % 2**63,
                v,
            ),
        )
        return {v: i for i, v in enumerate(keyed)}

    def test_positions_match_reference_and_are_partition_invariant(self):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.sample import seeded_shuffle

        ids = list(range(1000))
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
        ref = self._ref_positions(ids, 7)
        for parts in (1, 5):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = seeded_shuffle(
                ds, "doc_id", seed=7, rows_per_shard=128, num_partitions=4
            ).to_pandas()
            assert len(out) == 1000
            got = dict(zip(out["doc_id"], out["shuffle_pos"]))
            assert got == ref, f"parts={parts}"
            assert (
                out["shard"] == out["shuffle_pos"] // 128
            ).all()
        # a different seed produces a genuinely different order
        out2 = seeded_shuffle(
            ray.data.from_arrow(tbl), "doc_id", seed=8
        ).to_pandas()
        got2 = dict(zip(out2["doc_id"], out2["shuffle_pos"]))
        assert got2 != ref

    def test_empty_and_single_row(self):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.sample import seeded_shuffle

        empty = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64())})
        )
        assert seeded_shuffle(empty, "doc_id").count() == 0
        one = ray.data.from_arrow(pa.table({"doc_id": pa.array([9], pa.int64())}))
        row = seeded_shuffle(one, "doc_id", rows_per_shard=10).take_all()[0]
        assert row["shuffle_pos"] == 0 and row["shard"] == 0

    def test_string_ids_and_payload_carried(self):
        import pyarrow as pa
        import ray.data

        from text_dedup_ray.pipelines.sample import seeded_shuffle

        tbl = pa.table(
            {
                "img": pa.array([f"img-{i}" for i in range(50)]),
                "payload": pa.array([bytes([i]) * 4 for i in range(50)]),
            }
        )
        out = seeded_shuffle(
            ray.data.from_arrow(tbl).repartition(3), "img", seed=1
        ).to_pandas()
        ref = self._ref_positions([f"img-{i}" for i in range(50)], 1)
        assert dict(zip(out["img"], out["shuffle_pos"])) == ref
        assert set(out.columns) == {"img", "payload", "shuffle_pos"}
