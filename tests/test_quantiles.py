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


# ---------------------------------------------------------------------------
# approx_quantile_hist (one-pass sketch)
# ---------------------------------------------------------------------------


def _vals_ds(v, blocks=6):
    import ray.data as rd

    df = pd.DataFrame({"value": v})
    return rd.from_pandas([b for b in np.array_split(df, blocks) if len(b)])


def test_approx_quantile_accuracy_and_determinism(ray_session):
    from light_curve_feature_ray.pipelines.quantiles import (
        approx_quantile_hist,
    )

    rng = np.random.default_rng(23)
    v = rng.lognormal(0.0, 1.0, size=20_000)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    out = approx_quantile_hist(_vals_ds(v), "value", qs, bins=2048,
                               with_error=True)
    exact = np.quantile(v, qs)
    s = np.sort(v)
    for q, est, err in zip(qs, out["value"], out["rank_err_bound"]):
        # true rank of the estimate is within the bucket's count
        rank_est = np.searchsorted(s, est)
        assert abs(rank_est - q * (len(v) - 1)) <= err + 1
        # and for this smooth distribution the value itself is close
        ex = np.quantile(v, q)
        # error is bounded by one bucket width = (max-min)/bins
        assert abs(est - ex) <= max(0.02 * abs(ex), (s[-1] - s[0]) / 2048)
    _ = exact
    # block layout cannot change the sketch (mergeable partials)
    out2 = approx_quantile_hist(_vals_ds(v, blocks=17), "value", qs, bins=2048)
    np.testing.assert_array_equal(out["value"].to_numpy(),
                                  out2["value"].to_numpy())


def test_approx_quantile_edges(ray_session):
    from light_curve_feature_ray.pipelines.quantiles import (
        approx_quantile_hist,
    )

    # constant column short-circuits; NaNs are excluded like SQL NULLs
    v = np.full(100, 3.25)
    out = approx_quantile_hist(_vals_ds(v, 3), "value", (0.0, 0.5, 1.0))
    np.testing.assert_array_equal(out["value"].to_numpy(), [3.25] * 3)

    v2 = np.r_[np.full(50, np.nan), np.linspace(0, 1, 101)]
    out2 = approx_quantile_hist(_vals_ds(v2, 4), "value", (0.0, 1.0),
                                bins=64)
    assert abs(out2["value"].iloc[0] - 0.0) < 0.02
    assert abs(out2["value"].iloc[1] - 1.0) <= 1 / 64 + 1e-12  # within one bucket

    with pytest.raises(ValueError):
        approx_quantile_hist(_vals_ds(np.full(5, np.nan), 1), "value", (0.5,))
    with pytest.raises(ValueError):
        approx_quantile_hist(_vals_ds(np.arange(5.0), 1), "value", (1.5,))


def test_histogram_matches_numpy(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import histogram

    rng = np.random.default_rng(23)
    v = rng.normal(size=2000)
    v[::17] = np.nan
    df = pd.DataFrame({"value": v})
    bins = 16
    got = (
        histogram(rd.from_pandas(df).repartition(6), "value", bins=bins)
        .to_pandas()
        .sort_values("bin")
        .set_index("bin")["n"]
    )
    ok = v[~np.isnan(v)]
    lo, hi = ok.min(), ok.max()
    w = (hi - lo) / bins
    want = np.bincount(
        np.clip(np.floor((ok - lo) / w), 0, bins - 1).astype(int),
        minlength=bins,
    )
    for b in range(bins):
        assert got.get(b, 0) == want[b]
    assert int(got.sum()) == ok.size
    # degenerate range: single distinct value -> all rows in bin 0
    one = pd.DataFrame({"value": np.full(10, 3.25)})
    g1 = histogram(rd.from_pandas(one), "value", bins=8).to_pandas()
    assert list(g1["bin"]) == [0] and list(g1["n"]) == [10]
    with pytest.raises(ValueError):
        histogram(rd.from_pandas(one), "value", bins=0)


def test_winsorize_matches_duckdb_and_nan_passthrough(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import winsorize

    rng = np.random.default_rng(11)
    v = rng.lognormal(2, 1.5, 5000)
    v[::97] = np.nan
    ids = np.arange(v.size)
    ds = rd.from_pandas(pd.DataFrame({"i": ids, "x": v})).repartition(7)
    got = (
        winsorize(ds, "x", p_lo=0.05, p_hi=0.95)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        WITH v AS (SELECT unnest($i) i, unnest($v) x),
        q AS (SELECT quantile_cont(x, 0.05) lo, quantile_cont(x, 0.95) hi
              FROM v WHERE NOT isnan(x))
        SELECT i, CASE WHEN isnan(x) THEN x
                       ELSE least(greatest(x, lo), hi) END AS x_w
        FROM v, q ORDER BY i
        """,
        params={"i": ids.tolist(), "v": v.tolist()},
    ).df()
    nan = np.isnan(v)
    assert np.isnan(got["x_w"].to_numpy()[nan]).all()  # NaN passthrough
    ok = ~nan
    assert (got["x_w"].to_numpy()[ok] == exp["x_w"].to_numpy()[ok]).all()
    # the clip really clipped something on a lognormal tail
    assert (got["x_w"].to_numpy()[ok] != v[ok]).any()
    with pytest.raises(ValueError):
        winsorize(ds, "x", p_lo=0.9, p_hi=0.1)


def _mad_frame():
    rng = np.random.default_rng(23)
    n = 4000
    key = rng.integers(0, 37, n)
    # large offset: the segment-baseline/robust path must not cancel
    x = 1e6 + rng.normal(0, 2.0, n) + key * 10.0
    x[::211] = np.nan
    kf = key.astype(float)
    kf[::149] = np.nan  # null keys must be dropped
    return pd.DataFrame(
        {"i": np.arange(n), "k": pd.array(kf).astype("Int64"), "x": x}
    )


def test_grouped_mad_bitexact_and_partition_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import grouped_mad

    df = _mad_frame()
    outs = []
    for p in (1, 11):
        ds = rd.from_pandas(df).repartition(p)
        got = (
            grouped_mad(ds, "k", "x", num_partitions=5)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    exp = duckdb.sql(
        """
        WITH v AS (SELECT * FROM df WHERE k IS NOT NULL AND NOT isnan(x)),
        med AS (SELECT k, quantile_cont(x, 0.5) med FROM v GROUP BY k)
        SELECT v.k, any_value(m.med) AS med,
               quantile_cont(abs(v.x - m.med), 0.5) AS mad
        FROM v JOIN med m USING (k) GROUP BY v.k ORDER BY v.k
        """
    ).df()
    got = outs[0]
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["med"].to_numpy() == exp["med"].to_numpy()).all()
    assert (got["mad"].to_numpy() == exp["mad"].to_numpy()).all()


def test_mad_outliers_flags_match_sql(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import mad_outliers

    df = _mad_frame()
    ds = rd.from_pandas(df).repartition(6)
    got = (
        mad_outliers(ds, "k", "x", thresh=2.0, num_partitions=4)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        WITH v AS (SELECT * FROM df WHERE k IS NOT NULL AND NOT isnan(x)),
        med AS (SELECT k, quantile_cont(x, 0.5) med FROM v GROUP BY k),
        mad AS (SELECT v.k, quantile_cont(abs(v.x - m.med), 0.5) mad
                FROM v JOIN med m USING (k) GROUP BY v.k)
        SELECT v.i, abs(v.x - med) AS dev,
               (abs(v.x - med) > 2.0 * mad) AS is_outlier
        FROM v JOIN med USING (k) JOIN mad USING (k) ORDER BY v.i
        """
    ).df()
    # null-key / NaN-value rows dropped on both sides
    assert len(got) == len(exp)
    assert (got["i"].to_numpy() == exp["i"].to_numpy()).all()
    assert (got["dev"].to_numpy() == exp["dev"].to_numpy()).all()
    assert (
        got["is_outlier"].to_numpy() == exp["is_outlier"].to_numpy()
    ).all()
    assert got["is_outlier"].any() and not got["is_outlier"].all()
