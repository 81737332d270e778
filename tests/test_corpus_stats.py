"""corpus.temperature_weights / shingle_redundancy: DuckDB parity, edge
cases (empty input, all-short docs, single group), partition invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from text_dedup_ray.pipelines.corpus import shingle_redundancy, temperature_weights


def _docs_table(seed: int = 7, n: int = 300) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = ["spark", "ray", "data", "join", "sort", "hash", "merge", "scan"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 12))))
        for _ in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts,
            "lang": [f"l{int(i)}" for i in rng.integers(0, 4, n)],
            "source": [f"s{int(i)}" for i in rng.integers(0, 3, n)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def test_temperature_weights_match_duckdb():
    t = _docs_table()
    got = temperature_weights(ray.data.from_arrow(t), alpha=0.3).to_pandas()
    exp = duckdb.sql(
        """
        WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs,
                          sum(n_chars)::BIGINT AS n_units FROM t GROUP BY lang)
        SELECT lang, n_docs, n_units, power(n_units, 0.3) AS pow_alpha,
               power(n_units, 0.3) / max(power(n_units, 0.3)) OVER ()
                   AS sampling_weight
        FROM g ORDER BY lang
        """
    ).fetchdf()
    assert got["lang"].tolist() == exp["lang"].tolist()
    assert got["n_docs"].tolist() == exp["n_docs"].tolist()
    assert got["n_units"].tolist() == exp["n_units"].tolist()
    # single-libm-op doubles: bit-identical, not just close
    assert got["pow_alpha"].tolist() == exp["pow_alpha"].tolist()
    assert got["sampling_weight"].tolist() == exp["sampling_weight"].tolist()
    assert got["sampling_weight"].max() == 1.0


def test_temperature_weights_empty():
    t = _docs_table().slice(0, 0)
    got = temperature_weights(ray.data.from_arrow(t))
    assert got.num_rows == 0
    assert got.column_names == [
        "lang", "n_docs", "n_units", "pow_alpha", "sampling_weight",
    ]


def _redundancy_oracle(t: pa.Table, ngram: int) -> "object":
    return duckdb.sql(
        f"""
        WITH tk AS (SELECT source,
                      regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM t),
        w AS (SELECT source,
                unnest(list_transform(generate_series(1, len(ts) - {ngram - 1}),
                       j -> array_to_string(ts[j:j+{ngram - 1}], ' '))) AS g
              FROM tk WHERE len(ts) >= {ngram})
        SELECT source, count(*)::BIGINT AS n_shingles,
               count(DISTINCT g)::BIGINT AS n_distinct_shingles,
               1.0 - (count(DISTINCT g)::DOUBLE / count(*)) AS redundancy
        FROM w GROUP BY source ORDER BY source
        """
    ).fetchdf()


@pytest.mark.parametrize("ngram", [2, 3])
def test_shingle_redundancy_match_duckdb(ngram):
    t = _docs_table()
    got = shingle_redundancy(
        ray.data.from_arrow(t), ngram=ngram, num_partitions=5
    ).to_pandas()
    exp = _redundancy_oracle(t, ngram)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n_shingles"].tolist() == exp["n_shingles"].tolist()
    assert got["n_distinct_shingles"].tolist() == exp["n_distinct_shingles"].tolist()
    assert got["redundancy"].tolist() == exp["redundancy"].tolist()


def test_shingle_redundancy_partition_invariance():
    t = _docs_table(seed=11)
    a = shingle_redundancy(
        ray.data.from_arrow(t), ngram=3, num_partitions=2
    ).to_pandas()
    b = shingle_redundancy(
        ray.data.from_arrow(t).repartition(7), ngram=3, num_partitions=13
    ).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_shingle_redundancy_all_short_docs():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["one two", ""],  # no doc reaches 3 tokens
            "source": ["s0", "s1"],
        }
    )
    got = shingle_redundancy(ray.data.from_arrow(t), ngram=3)
    assert got.num_rows == 0
    assert got.column_names == [
        "source", "n_shingles", "n_distinct_shingles", "redundancy",
    ]


def test_shingle_redundancy_cross_doc_distinct():
    # two docs in one source sharing every shingle: distinct must be
    # counted across documents, not per-doc
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["a b c d", "a b c d"],
            "source": ["s0", "s0"],
        }
    )
    got = shingle_redundancy(ray.data.from_arrow(t), ngram=3).to_pandas()
    assert got["n_shingles"].tolist() == [4]
    assert got["n_distinct_shingles"].tolist() == [2]
    assert got["redundancy"].tolist() == [0.5]


def test_content_checksums_match_duckdb_and_partition_invariant():
    from text_dedup_ray.pipelines.corpus import content_checksums

    t = _docs_table(seed=13)
    got = content_checksums(ray.data.from_arrow(t)).to_pandas()
    exp = duckdb.sql(
        """
        SELECT source, count(*)::BIGINT AS n_docs,
               (sum(('0x' || substr(md5(text), 1, 16))::UBIGINT)::HUGEINT
                % 18446744073709551616::HUGEINT)::UBIGINT AS checksum64
        FROM t GROUP BY source ORDER BY source
        """
    ).fetchdf()
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n_docs"].tolist() == exp["n_docs"].tolist()
    assert [int(v) for v in got["checksum64"]] == [int(v) for v in exp["checksum64"]]

    rep = content_checksums(ray.data.from_arrow(t).repartition(7)).to_pandas()
    assert rep.values.tolist() == got.values.tolist()


def test_content_checksums_id_binding_detects_reassignment():
    from text_dedup_ray.pipelines.corpus import content_checksums

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["alpha", "beta"],
            "source": ["s", "s"],
        }
    )
    swapped = pa.table(
        {
            "doc_id": pa.array([2, 1], pa.int64()),
            "text": ["alpha", "beta"],
            "source": ["s", "s"],
        }
    )
    a = content_checksums(ray.data.from_arrow(t), id_column="doc_id")
    b = content_checksums(ray.data.from_arrow(swapped), id_column="doc_id")
    assert a["checksum64"][0].as_py() != b["checksum64"][0].as_py()
    # without id binding the two corpora are content-identical
    c = content_checksums(ray.data.from_arrow(t))
    d = content_checksums(ray.data.from_arrow(swapped))
    assert c["checksum64"][0].as_py() == d["checksum64"][0].as_py()


def test_content_checksums_empty():
    from text_dedup_ray.pipelines.corpus import content_checksums

    t = _docs_table().slice(0, 0)
    got = content_checksums(ray.data.from_arrow(t))
    assert got.num_rows == 0
    assert got.column_names == ["source", "n_docs", "checksum64"]


def test_top_frequent_ngrams_match_duckdb():
    from text_dedup_ray.pipelines.corpus import top_frequent_ngrams

    t = _docs_table(seed=21)
    got = top_frequent_ngrams(
        ray.data.from_arrow(t), ngram=2, n=25, num_partitions=5
    ).to_pandas()
    exp = duckdb.sql(
        """
        WITH tk AS (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM t),
        w AS (SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                     j -> array_to_string(ts[j:j+1], ' '))) AS g
              FROM tk WHERE len(ts) >= 2)
        SELECT g AS gram, count(*)::BIGINT AS cnt FROM w GROUP BY g
        ORDER BY cnt DESC, gram ASC LIMIT 25
        """
    ).fetchdf()
    assert got["gram"].tolist() == exp["gram"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()


def test_top_frequent_ngrams_partition_invariance_and_empty():
    from text_dedup_ray.pipelines.corpus import top_frequent_ngrams

    t = _docs_table(seed=23)
    a = top_frequent_ngrams(ray.data.from_arrow(t), ngram=3, n=10, num_partitions=2)
    b = top_frequent_ngrams(
        ray.data.from_arrow(t).repartition(9), ngram=3, n=10, num_partitions=7
    )
    assert a.to_pydict() == b.to_pydict()

    e = top_frequent_ngrams(ray.data.from_arrow(t.slice(0, 0)), ngram=2, n=5)
    assert e.num_rows == 0 and e.column_names == ["gram", "cnt"]


def test_temperature_weights_all_zero_sizes_null_weight():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "lang": ["en", "fr"],
            "n_chars": pa.array([0, 0], pa.int64()),
        }
    )
    got = temperature_weights(ray.data.from_arrow(t)).to_pandas()
    exp = duckdb.sql(
        """
        WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs,
                          sum(n_chars)::BIGINT AS n_units FROM t GROUP BY lang)
        SELECT lang, n_docs, n_units, power(n_units, 0.3) AS pow_alpha,
               power(n_units, 0.3) / max(power(n_units, 0.3)) OVER ()
                   AS sampling_weight
        FROM g ORDER BY lang
        """
    ).fetchdf()
    assert got["pow_alpha"].tolist() == [0.0, 0.0]
    assert got["sampling_weight"].isna().all() and exp["sampling_weight"].isna().all()


def _shingle_hll_oracle_sql(table: str, ngram: int, p: int) -> str:
    w = 64 - p
    return f"""
WITH tk AS (SELECT source, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
            FROM {table}),
g AS (SELECT source, unnest(list_transform(generate_series(1, len(ts) - {ngram - 1}),
        j -> array_to_string(ts[j:j+{ngram - 1}], ' '))) AS gr
      FROM tk WHERE len(ts) >= {ngram}),
h AS (SELECT source, ('0x' || substr(md5(gr), 1, 16))::UBIGINT AS hv FROM g),
b AS (SELECT source, (hv >> {w})::BIGINT AS idx,
             hv & ((1::UBIGINT << {w}) - 1) AS low FROM h),
s1 AS (SELECT source, idx, low | (low >> 1) AS x FROM b),
s2 AS (SELECT source, idx, x | (x >> 2) AS x FROM s1),
s3 AS (SELECT source, idx, x | (x >> 4) AS x FROM s2),
s4 AS (SELECT source, idx, x | (x >> 8) AS x FROM s3),
s5 AS (SELECT source, idx, x | (x >> 16) AS x FROM s4),
s6 AS (SELECT source, idx, x | (x >> 32) AS x FROM s5)
SELECT source, idx, max(({w} - bit_count(x))::BIGINT + 1) AS rank
FROM s6 GROUP BY source, idx
"""


def test_shingle_hll_registers_match_duckdb():
    from text_dedup_ray.pipelines.corpus import shingle_hll_registers

    t = _docs_table(seed=31)
    got = (
        shingle_hll_registers(
            ray.data.from_arrow(t), ngram=2, precision=6, num_partitions=3
        )
        .to_pandas()
        .sort_values(["source", "idx"])
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(_shingle_hll_oracle_sql("t", 2, 6))
        .fetchdf()
        .sort_values(["source", "idx"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == exp.values.tolist()


def test_shingle_count_approx_error_bound_and_invariance():
    from text_dedup_ray.pipelines.corpus import shingle_count_approx

    t = _docs_table(seed=33, n=500)
    got = (
        shingle_count_approx(
            ray.data.from_arrow(t), ngram=2, precision=12, num_partitions=3
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exact = _redundancy_oracle(t, 2)
    assert got["source"].tolist() == exact["source"].tolist()
    for est, true in zip(got["approx_distinct_shingles"], exact["n_distinct_shingles"]):
        assert abs(est - true) <= max(5.0, 5 * 1.04 / (2**6) * true)

    rep = (
        shingle_count_approx(
            ray.data.from_arrow(t).repartition(9), ngram=2, precision=12,
            num_partitions=7,
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert rep.values.tolist() == got.values.tolist()
