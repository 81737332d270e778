"""Distributed prefix sum + sequence packing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.pack import global_prefix_sum, pack_sequences


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


class TestPrefixSum:
    def test_matches_duckdb_window(self):
        rng = np.random.default_rng(41)
        ids = rng.permutation(3000).tolist()  # unsorted, unique
        n = rng.integers(0, 900, 3000).tolist()
        tbl = pa.table({"doc_id": ids, "n_tok": n})
        got = global_prefix_sum(
            ray.data.from_arrow(tbl).repartition(7), "doc_id", "n_tok",
            num_partitions=5,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "SELECT doc_id, n_tok, coalesce(sum(n_tok) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT "
            "AS offset FROM t"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_partition_invariance_and_skew(self):
        # heavily skewed keys: most ids in one narrow range
        ids = list(range(100)) + list(range(100000, 100020))
        n = [5] * 120
        tbl = pa.table({"doc_id": ids, "n_tok": n})
        ds = ray.data.from_arrow(tbl)
        a = global_prefix_sum(ds.repartition(1), "doc_id", "n_tok", num_partitions=1).to_pandas()
        b = global_prefix_sum(ds.repartition(6), "doc_id", "n_tok", num_partitions=9).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))
        assert _canon(a).sort_values("doc_id").offset.tolist() == [5 * i for i in range(120)]

    def test_empty(self):
        tbl = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_tok": pa.array([], pa.int64())}
        )
        assert global_prefix_sum(ray.data.from_arrow(tbl), "doc_id", "n_tok").count() == 0


class TestPackSequences:
    def test_bins_and_straddles(self):
        tbl = pa.table(
            {"doc_id": [1, 2, 3, 4], "n_tok": [100, 30, 0, 90]}
        )
        got = (
            pack_sequences(ray.data.from_arrow(tbl), "n_tok", capacity=64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # offsets: 0, 100, 130, 130; capacity 64
        assert got.offset.tolist() == [0, 100, 130, 130]
        assert got.first_bin.tolist() == [0, 1, 2, 2]
        assert got.last_bin.tolist() == [1, 2, 2, 3]
        assert got.straddles.tolist() == [True, True, False, True]

    def test_matches_duckdb(self):
        rng = np.random.default_rng(9)
        tbl = pa.table(
            {
                "doc_id": rng.permutation(500).tolist(),
                "n_tok": rng.integers(1, 300, 500).tolist(),
            }
        )
        cap = 256
        got = pack_sequences(
            ray.data.from_arrow(tbl).repartition(4), "n_tok", capacity=cap,
            num_partitions=6,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            'WITH o AS (SELECT doc_id, n_tok, coalesce(sum(n_tok) OVER ('
            'ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)'
            '::BIGINT AS "offset" FROM t) '
            f'SELECT doc_id, n_tok, "offset", "offset" // {cap} AS first_bin, '
            f'CASE WHEN n_tok > 0 THEN ("offset" + n_tok - 1) // {cap} '
            f'ELSE "offset" // {cap} END AS last_bin, '
            f'CASE WHEN n_tok > 0 THEN ("offset" + n_tok - 1) // {cap} > "offset" // {cap} '
            'ELSE FALSE END AS straddles FROM o'
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)
