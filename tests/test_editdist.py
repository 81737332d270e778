"""Token-edit-distance-1 deletion-neighborhood join: exact pair parity
vs the independent SQL construction plus structural edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.editdist import token_ed1_dedup, token_ed1_pairs

SQL = """
WITH t AS (SELECT rid, text AS caption, str_split(text, ' ') AS ts FROM c),
dels AS (SELECT rid, caption, i AS pos,
                coalesce(array_to_string(list_concat(ts[1:i-1], ts[i+1:]), ' '), '') AS k
         FROM t, UNNEST(generate_series(1, len(ts))) AS u(i)),
p0 AS (SELECT a.rid AS src, b.rid AS dst, 0 AS token_ed
       FROM t a JOIN t b ON a.caption = b.caption AND a.rid < b.rid),
pin AS (SELECT DISTINCT least(a.rid, b.rid) AS src, greatest(a.rid, b.rid) AS dst, 1 AS token_ed
        FROM dels a JOIN t b ON a.k = b.caption AND a.rid <> b.rid),
psub AS (SELECT DISTINCT least(a.rid, b.rid) AS src, greatest(a.rid, b.rid) AS dst, 1 AS token_ed
         FROM dels a JOIN dels b ON a.pos = b.pos AND a.k = b.k
         AND a.rid < b.rid AND a.caption <> b.caption)
SELECT * FROM p0 UNION SELECT * FROM pin UNION SELECT * FROM psub
"""


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _pairs(tbl, **kw):
    return token_ed1_pairs(
        ray.data.from_arrow(tbl).repartition(3), "rid", "text", **kw
    ).to_pandas()


def _ref_ed(a, b):
    """Straight-line token Levenshtein for the brute-force check."""
    ta, tb = (a.split(" ") if a else []), (b.split(" ") if b else [])
    la, lb = len(ta), len(tb)
    d = np.zeros((la + 1, lb + 1), np.int64)
    d[:, 0] = np.arange(la + 1)
    d[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i, j] = min(
                d[i - 1, j] + 1, d[i, j - 1] + 1,
                d[i - 1, j - 1] + (ta[i - 1] != tb[j - 1]),
            )
    return int(d[la, lb])


class TestTokenEd1Pairs:
    def test_handcrafted_vs_sql(self):
        rows = [
            (0, "a b c d"), (1, "a b c d"), (2, "a b x d"), (3, "a b c"),
            (4, "a b c d e"), (5, "z z z"), (6, ""), (7, "q"), (8, "r"),
            (9, "x x y"), (10, "x y"),  # adjacent-dup indel: one pair, not two
        ]
        tbl = pa.table(
            {"rid": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
        got = _pairs(tbl, num_partitions=4)
        con = duckdb.connect()
        con.register("c", tbl)
        exp = con.execute(SQL).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_random_vs_bruteforce(self):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(6)]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(0, 6)))
            for _ in range(120)
        ]
        tbl = pa.table({"rid": list(range(len(texts))), "text": texts})
        got = _pairs(tbl, num_partitions=4)
        got_set = {(int(r.src), int(r.dst), int(r.token_ed)) for r in got.itertuples()}
        truth = set()
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                ed = _ref_ed(texts[i], texts[j])
                if ed <= 1:
                    truth.add((i, j, ed))
        assert got_set == truth

    def test_dedup_clusters_match_pair_graph(self):
        rows = [(0, "a b"), (1, "a b"), (2, "a c"), (3, "d e f"), (4, "d e")]
        tbl = pa.table(
            {"rid": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
        parents = token_ed1_dedup(ray.data.from_arrow(tbl), "rid", "text")
        assert parents == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}

    def test_empty_and_singletons(self):
        tbl = pa.table({"rid": [1, 2], "text": ["unique one", "totally other"]})
        assert len(_pairs(tbl)) == 0
        empty = pa.table(
            {"rid": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        assert len(_pairs(empty)) == 0

    def test_null_text_rows_never_pair(self):
        tbl = pa.table(
            {
                "rid": [1, 2, 3, 4],
                "text": ["a b", None, "a b", None],
            }
        )
        got = _pairs(tbl)
        assert {(int(r.src), int(r.dst)) for r in got.itertuples()} == {(1, 3)}
