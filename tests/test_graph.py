"""Iterative PageRank: DuckDB unrolled-iteration parity + structure."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.graph import pagerank


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _sql(iterations: int) -> str:
    parts = [
        "WITH e AS (SELECT DISTINCT src, dst FROM t), "
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src), "
        "nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e), "
        "r0 AS (SELECT v, 1.0 AS r FROM nodes)"
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f", r{k} AS (SELECT n.v, 0.15 + 0.85 * "
            f"coalesce(sum(r{k-1}.r / deg.d), 0) AS r "
            f"FROM nodes n LEFT JOIN e ON e.dst = n.v "
            f"LEFT JOIN deg ON deg.src = e.src "
            f"LEFT JOIN r{k-1} ON r{k-1}.v = e.src GROUP BY n.v)"
        )
    parts.append(f" SELECT v AS node, round(r, 6) AS rank FROM r{iterations}")
    return "".join(parts)


class TestPageRank:
    def test_random_graph_vs_duckdb(self):
        rng = np.random.default_rng(21)
        n_edges = 4000
        tbl = pa.table(
            {
                "src": rng.integers(0, 300, n_edges).tolist(),
                "dst": rng.integers(0, 300, n_edges).tolist(),
            }
        )
        got = pagerank(
            ray.data.from_arrow(tbl).repartition(5), iterations=4,
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(_sql(4)).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_star_graph_hub_wins(self):
        # 10 leaves all point at node 0
        tbl = pa.table({"src": list(range(1, 11)), "dst": [0] * 10})
        got = pagerank(ray.data.from_arrow(tbl), iterations=3).to_pandas()
        r = dict(zip(got.node, got["rank"]))
        assert r[0] == max(r.values())
        # leaves have no in-edges: pure teleport
        assert all(abs(r[i] - 0.15) < 1e-9 for i in range(1, 11))

    def test_duplicate_edges_count_once(self):
        a = pa.table({"src": [1, 1, 1], "dst": [2, 2, 2]})
        b = pa.table({"src": [1], "dst": [2]})
        ra = pagerank(ray.data.from_arrow(a), iterations=2).to_pandas()
        rb = pagerank(ray.data.from_arrow(b), iterations=2).to_pandas()
        pd.testing.assert_frame_equal(_canon(ra), _canon(rb))


class TestCooccurrence:
    def test_matches_duckdb(self):
        from text_dedup_ray.pipelines.graph import cooccurrence_top_pairs

        rng = np.random.default_rng(6)
        tbl = pa.table(
            {
                "o": rng.integers(0, 400, 5000).tolist(),
                "p": rng.integers(0, 60, 5000).tolist(),
            }
        )
        got = cooccurrence_top_pairs(
            ray.data.from_arrow(tbl).repartition(5), "o", "p", top_n=15,
            num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.execute(
            "WITH d AS (SELECT DISTINCT o, p FROM t), "
            "pr AS (SELECT least(x.p, y.p) AS a, greatest(x.p, y.p) AS b, "
            "count(*)::BIGINT AS cnt FROM d x JOIN d y ON x.o = y.o AND x.p < y.p "
            "GROUP BY 1, 2) "
            "SELECT a, b, cnt, 0::BIGINT AS capped_baskets "
            "FROM pr ORDER BY cnt DESC, a, b LIMIT 15"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_duplicate_items_in_basket_count_once(self):
        from text_dedup_ray.pipelines.graph import cooccurrence_top_pairs

        tbl = pa.table({"o": [1, 1, 1, 2, 2], "p": [7, 7, 8, 7, 8]})
        got = cooccurrence_top_pairs(
            ray.data.from_arrow(tbl), "o", "p", top_n=5
        ).to_pandas()
        assert len(got) == 1
        assert got.iloc[0].tolist() == [7, 8, 2, 0]

    def test_capped_baskets_are_counted_not_silent(self):
        from text_dedup_ray.pipelines.graph import cooccurrence_top_pairs

        # basket 1 has 5 items (> cap of 3) -> all its pairs dropped, but
        # the drop is surfaced in capped_baskets; basket 2 is under the cap
        tbl = pa.table(
            {
                "o": [1, 1, 1, 1, 1, 2, 2],
                "p": [10, 11, 12, 13, 14, 7, 8],
            }
        )
        got = cooccurrence_top_pairs(
            ray.data.from_arrow(tbl).repartition(3), "o", "p",
            top_n=5, basket_cap=3, num_partitions=4,
        ).to_pandas()
        assert got["capped_baskets"].tolist() == [1]
        assert got[["a", "b", "cnt"]].iloc[0].tolist() == [7, 8, 1]
