"""Distributed exact quantiles (pipelines/quantiles.py): bit-exactness
vs DuckDB quantile_cont across distributions (incl. duplicate piles at a
bracket edge — the pure-bisection pathological case), order-stat
exactness vs np.sort, partition invariance, and the loud bounds."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _cases():
    rng = np.random.default_rng(77)
    return {
        "uniform": rng.uniform(-50, 50, 20000),
        "lognormal": rng.lognormal(1, 2, 20000),
        "dupes": np.repeat(rng.integers(0, 20, 2000).astype(float), 10),
        "const": np.full(3000, 3.14),
        "zeros_heavy": np.where(
            rng.random(15000) < 0.7, 0.0, rng.uniform(0, 1, 15000)
        ),
        "with_nan": np.where(
            rng.random(8000) < 0.1, np.nan, rng.normal(0, 1, 8000)
        ),
    }


QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


@pytest.mark.parametrize("name", list(_cases()))
def test_bitexact_vs_duckdb(ray_session, name):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import quantile_cont

    v = _cases()[name]
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(9)
    # small max_candidates forces real refinement rounds
    got = quantile_cont(ds, "x", QS, max_candidates=500)
    for q, g in zip(QS, got["value"]):
        e = duckdb.sql(
            f"select quantile_cont(x, {q!r}) from (select unnest($v) x) "
            "where not isnan(x)",
            params={"v": v.tolist()},
        ).fetchone()[0]
        assert g == e, (name, q, g.hex(), e.hex())


def test_order_stats_exact_and_partition_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import exact_order_stats

    rng = np.random.default_rng(3)
    v = rng.normal(0, 100, 10000)
    s = np.sort(v)
    ranks = [0, 1, 137, 4999, 5000, 9998, 9999]
    outs = []
    for p in (1, 13):
        ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(p)
        stats, n = exact_order_stats(ds, "x", ranks, max_candidates=200)
        assert n == 10000
        outs.append(stats)
        for r in ranks:
            assert stats[r] == s[r]
    assert outs[0] == outs[1]


def test_bounds_and_errors(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import (
        exact_order_stats,
        quantile_cont,
    )

    ds = rd.from_pandas(pd.DataFrame({"x": np.arange(100, dtype=float)}))
    with pytest.raises(ValueError, match="out of range"):
        exact_order_stats(ds, "x", [100])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        quantile_cont(ds, "x", [1.5])
    empty = rd.from_pandas(pd.DataFrame({"x": np.array([np.nan, np.nan])}))
    with pytest.raises(ValueError, match="no non-null"):
        quantile_cont(empty, "x", [0.5])
    # a duplicate pile bigger than max_candidates must still resolve
    # (bin min/max snapping), not loop or raise
    dup = rd.from_pandas(
        pd.DataFrame({"x": np.repeat([1.0, 2.0], 5000)})
    ).repartition(5)
    got = quantile_cont(dup, "x", [0.25, 0.75], max_candidates=50)
    assert list(got["value"]) == [1.0, 2.0]


def test_grouped_quantiles_bitexact_and_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import (
        grouped_quantile_cont,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "dup"], 8000),
            "x": rng.normal(0, 50, 8000),
        }
    )
    df.loc[df["g"] == "dup", "x"] = 7.0  # whole-group duplicates
    df.loc[rng.random(8000) < 0.05, "x"] = np.nan
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    outs = []
    for p in (2, 7):
        got = (
            grouped_quantile_cont(
                rd.from_pandas(df).repartition(9), "g", "x", qs,
                num_partitions=p,
            )
            .to_pandas()
            .sort_values(["g", "q"])
            .reset_index(drop=True)
        )
        outs.append(got)
        for (gname, q), row in got.groupby(["g", "q"]):
            e = duckdb.sql(
                f"select quantile_cont(x, {q!r}) from df "
                f"where g = '{gname}' and not isnan(x)"
            ).fetchone()[0]
            v = row["value"].iloc[0]
            assert v == e, (gname, q, v, e)
    pd.testing.assert_frame_equal(outs[0], outs[1])
