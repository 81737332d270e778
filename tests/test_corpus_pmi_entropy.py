"""Bigram PMI collocations and per-group token entropy vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from text_dedup_ray.pipelines.corpus import bigram_pmi, token_entropy_by_group


def _canon(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


def _docs(n=400, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts, langs = [], []
    for i in range(n):
        toks = list(rng.choice(vocab, rng.integers(5, 40)))
        if rng.random() < 0.4:
            toks += ["hot", "pair"]  # planted collocation
        texts.append(" ".join(toks))
        langs.append(rng.choice(["en", "de", "fr"]))
    return pa.table({"doc_id": list(range(n)), "text": texts, "lang": langs})


class TestBigramPMI:
    def test_matches_duckdb(self):
        tbl = _docs()
        got = bigram_pmi(
            ray.data.from_arrow(tbl).repartition(4), n=30, num_partitions=4
        ).to_pandas()
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = con.execute(
            "WITH tk AS (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts "
            "FROM documents), "
            "tok AS (SELECT unnest(ts) AS t FROM tk), "
            "uni AS (SELECT t, count(*)::DOUBLE AS c FROM tok GROUP BY t), "
            "t1 AS (SELECT count(*)::DOUBLE AS v FROM tok), "
            "bg AS (SELECT unnest(list_transform(generate_series(1, len(ts) - 1), "
            "j -> array_to_string(ts[j:j+1], ' '))) AS g FROM tk WHERE len(ts) >= 2), "
            "bgc AS (SELECT g, count(*)::DOUBLE AS c FROM bg GROUP BY g), "
            "t2 AS (SELECT count(*)::DOUBLE AS v FROM bg), "
            "top AS (SELECT g, c FROM bgc ORDER BY c DESC, g ASC LIMIT 30) "
            "SELECT top.g AS gram, top.c::BIGINT AS cnt, "
            "round(ln((top.c / t2.v) / ((ua.c / t1.v) * (ub.c / t1.v))), 6) AS pmi "
            "FROM top CROSS JOIN t1 CROSS JOIN t2 "
            "JOIN uni ua ON ua.t = split_part(top.g, ' ', 1) "
            "JOIN uni ub ON ub.t = split_part(top.g, ' ', 2)"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_planted_collocation_ranks_high(self):
        got = bigram_pmi(ray.data.from_arrow(_docs()), n=30).to_pandas()
        top_by_pmi = got.sort_values("pmi", ascending=False).iloc[0]
        assert top_by_pmi.gram == "hot pair"


class TestTokenEntropy:
    def test_matches_duckdb(self):
        tbl = _docs()
        got = token_entropy_by_group(
            ray.data.from_arrow(tbl).repartition(4),
            group_column="lang", num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = con.execute(
            "WITH tk AS (SELECT lang, unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9_]+')) AS t FROM documents), "
            "c AS (SELECT lang, t, count(*)::DOUBLE AS c FROM tk GROUP BY lang, t), "
            "g AS (SELECT lang, sum(c) AS T, sum(c * ln(c)) AS s FROM c GROUP BY lang) "
            "SELECT lang, round(ln(T) - s / T, 6) AS token_entropy, "
            "T::BIGINT AS n_tokens FROM g"
        ).fetchdf()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)

    def test_uniform_beats_skewed(self):
        # 100 distinct tokens once each vs one token 100 times
        tbl = pa.table(
            {
                "doc_id": [0, 1],
                "text": [" ".join(f"t{i}" for i in range(100)),
                         " ".join(["same"] * 100)],
                "lang": ["uniform", "skewed"],
            }
        )
        got = token_entropy_by_group(ray.data.from_arrow(tbl)).to_pandas()
        h = dict(zip(got.lang, got.token_entropy))
        assert abs(h["uniform"] - np.log(100)) < 1e-6
        assert h["skewed"] == 0.0
