"""pivot_table / unpivot: long<->wide reshape vs DuckDB PIVOT / UNION ALL."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from text_dedup_ray.pipelines.reshape import pivot_table, unpivot


def _events(n=500, seed=7):
    rng = np.random.RandomState(seed)
    types = np.array(["click", "view", "buy"])
    return pa.table(
        {
            "day": pa.array(rng.randint(0, 9, n), pa.int64()),
            "event_type": pa.array(types[rng.randint(0, 3, n)]),
            "value": pa.array(rng.rand(n) * 10),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_pivot_count_matches_duckdb():
    t = _events()
    got = (
        pivot_table(
            ray.data.from_arrow(t).repartition(5), "day", "event_type"
        )
        .to_pandas()
    )
    want = duckdb.connect().execute(
        "PIVOT (SELECT day, event_type FROM t) ON event_type "
        "USING count(*) GROUP BY day"
    ).df()
    pd.testing.assert_frame_equal(
        _canon(got).astype({"buy": "int64", "click": "int64", "view": "int64"}),
        _canon(want).astype({"buy": "int64", "click": "int64", "view": "int64"}),
    )


def test_pivot_sum_with_explicit_values_and_zero_fill():
    t = _events()
    got = (
        pivot_table(
            ray.data.from_arrow(t).repartition(4),
            "day",
            "event_type",
            value_column="value",
            pivot_values=["click", "view", "buy", "absent"],
        )
        .to_pandas()
    )
    want = duckdb.connect().execute(
        "SELECT day, "
        "coalesce(sum(value) FILTER (event_type='click'), 0) AS click, "
        "coalesce(sum(value) FILTER (event_type='view'), 0) AS view, "
        "coalesce(sum(value) FILTER (event_type='buy'), 0) AS buy, "
        "0.0::DOUBLE AS absent FROM t GROUP BY day"
    ).df()
    g, w = _canon(got), _canon(want)
    assert (g["absent"] == 0).all()
    for c in g.columns:
        np.testing.assert_allclose(g[c].to_numpy(), w[c].to_numpy(), rtol=1e-9)


def test_pivot_unknown_values_are_dropped_and_discovery_caps():
    t = _events(60)
    ds = ray.data.from_arrow(t)
    # explicit values exclude 'buy' -> those rows contribute nowhere
    got = pivot_table(ds, "day", "event_type", pivot_values=["click"]).to_pandas()
    want = duckdb.connect().execute(
        "SELECT day, count(*) FILTER (event_type='click') AS click FROM t GROUP BY day"
    ).df()
    g, w = _canon(got), _canon(want)
    assert (g["click"].to_numpy() == w["click"].to_numpy()).all()
    import pytest

    with pytest.raises(ValueError, match="schema explosion"):
        pivot_table(ds, "day", "value", max_pivot_values=3)


def test_unpivot_roundtrip_matches_union_all():
    t = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "a": pa.array([1.0, 2.0, 3.0]),
            "b": pa.array([10.0, 20.0, 30.0]),
        }
    )
    got = (
        unpivot(ray.data.from_arrow(t).repartition(2), ["k"], ["a", "b"])
        .to_pandas()
    )
    want = duckdb.connect().execute(
        "SELECT k, 'a' AS variable, a AS value FROM t "
        "UNION ALL SELECT k, 'b', b FROM t"
    ).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_unpivot_empty_block_schema_stable():
    t = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "a": pa.array([], pa.float64()),
        }
    )
    out = unpivot(ray.data.from_arrow(t), ["k"], ["a"])
    assert out.count() == 0
    # mixed empty + non-empty blocks must concat cleanly (schema-stable
    # empty output from the per-block transform)
    t2 = pa.table({"k": pa.array([5], pa.int64()), "a": pa.array([2.5])})
    both = unpivot(
        ray.data.from_arrow(t).union(ray.data.from_arrow(t2)), ["k"], ["a"]
    ).to_pandas()
    assert list(both.columns) == ["k", "variable", "value"]
    assert both.to_dict("records") == [{"k": 5, "variable": "a", "value": 2.5}]
