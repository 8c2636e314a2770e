"""Round-4 closing operators: merged-interval coverage, rate-limit
throttle, first-seen cumulative counts, chi-square crosstab.

Contracts pinned here (the driver testdata can't exercise them):
- null keys / timestamps / values follow each operator's documented
  drop rule, verified against the ACTUAL oracle SQL from __ray_entry__
  over synthetic null-bearing tables;
- outputs are invariant to block layout / partition count;
- interval_coverage matches a brute-force per-key merge (incl. touching
  intervals and duplicate timestamps);
- throttle picks (min ts, min id) deterministically within a cell;
- chi2_crosstab buckets negative keys non-negatively on both sides.
"""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test_r4c", "__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _round6(v):
    v = np.asarray(v, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(v) * 1e6 + 0.5) / 1e6, v)
    return np.where(np.isnan(v), np.nan, out)


@pytest.fixture(scope="module")
def null_events_c(entry_mod):
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # include NEGATIVE ids: chi2 bucket sign + coverage keys
            "user_id": rng.integers(-4, 8, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase"], size=n
            ),
            "value": rng.normal(scale=30, size=n),
        }
    )
    ts = rng.integers(0, 5 * 86_400_000_000, size=n)
    # force duplicate timestamps so tie-breaks matter
    idx = np.arange(0, n - 1, 7)
    ts[idx + 1] = ts[idx]
    df["ts"] = pd.to_datetime(ts, unit="us")
    df["user_id"] = df["user_id"].astype("Int64")
    df.loc[df.index % 11 == 0, "user_id"] = pd.NA
    df.loc[df.index % 13 == 0, "ts"] = pd.NaT
    df.loc[df.index % 17 == 0, "event_type"] = None
    df.loc[df.index % 19 == 0, "value"] = np.nan
    return df


def _brute_coverage(df, scale_s=60):
    d = df.dropna(subset=["user_id", "ts", "value"])
    rows = []
    for uid, g in d.groupby("user_id"):
        s = (
            g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            // 1_000_000
        )
        e = s + np.floor(np.abs(g["value"].to_numpy())).astype(
            np.int64
        ) * scale_s
        order = np.argsort(s, kind="stable")
        s, e = s[order], e[order]
        islands = []
        cur_s, cur_e = s[0], e[0]
        for i in range(1, len(s)):
            if s[i] > cur_e:  # strictly: touching intervals MERGE
                islands.append((cur_s, cur_e))
                cur_s, cur_e = s[i], e[i]
            else:
                cur_e = max(cur_e, e[i])
        islands.append((cur_s, cur_e))
        rows.append(
            {
                "user_id": uid,
                "n_intervals": len(islands),
                "covered_s": sum(b - a for a, b in islands),
                "span_s": islands[-1][1] - islands[0][0],
            }
        )
    return (
        pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
    )


def test_interval_coverage_brute_force_and_sql(
    ray_session, entry_mod, null_events_c
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import interval_coverage

    got = (
        interval_coverage(
            rd.from_pandas(null_events_c[["user_id", "ts", "value"]]),
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = _brute_coverage(null_events_c)
    assert list(got["user_id"]) == list(want["user_id"])
    for c in ("n_intervals", "covered_s", "span_s"):
        assert list(got[c]) == list(want[c]), c

    con = duckdb.connect()
    con.register("events", null_events_c)
    sql = (
        con.execute(entry_mod.SQL_EVENTS_COVERAGE)
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(sql["user_id"]) == list(got["user_id"])
    for c in ("n_intervals", "covered_s", "span_s"):
        assert list(sql[c].astype("int64")) == list(got[c]), c


def test_interval_coverage_touching_merges(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import interval_coverage

    # [0, 60) then [60, 120): touching -> ONE island of 120 s
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1], dtype=np.int64),
            "ts": pd.to_datetime([0, 60_000_000], unit="us"),
            "value": [1.0, 1.0],
        }
    )
    got = interval_coverage(rd.from_pandas(df)).to_pandas()
    assert got.iloc[0]["n_intervals"] == 1
    assert got.iloc[0]["covered_s"] == 120
    assert got.iloc[0]["span_s"] == 120


def test_interval_coverage_partition_invariance(ray_session, null_events_c):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import interval_coverage

    outs = []
    for parts, blocks in ((3, 1), (11, 7)):
        ds = rd.from_pandas(
            null_events_c[["user_id", "ts", "value"]]
        ).repartition(blocks)
        outs.append(
            interval_coverage(ds, num_partitions=parts)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_throttle_null_parity_and_determinism(
    ray_session, entry_mod, null_events_c
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import throttle

    got = (
        throttle(
            rd.from_pandas(
                null_events_c[
                    ["event_id", "user_id", "event_type", "ts", "value"]
                ]
            ),
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_c)
    want = (
        con.execute(entry_mod.SQL_EVENTS_THROTTLE)
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["event_id"]) == list(want["event_id"])
    assert list(got["window_start"]) == list(
        want["window_start"].astype("int64")
    )
    np.testing.assert_allclose(
        _round6(got["value"].to_numpy()),
        want["value"].to_numpy(),
        rtol=0,
        atol=0,
    )
    # exactly one survivor per (user, type, window) among non-null rows
    d = null_events_c.dropna(subset=["user_id", "event_type", "ts"])
    w = (
        d["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
    ) // 3600
    cells = d.assign(w=w).groupby(["user_id", "event_type", "w"])
    assert len(got) == cells.ngroups
    # the survivor is (min ts, min id) of its cell
    first = (
        d.assign(w=w)
        .sort_values(["ts", "event_id"], kind="mergesort")
        .groupby(["user_id", "event_type", "w"], as_index=False)
        .first()
    )
    assert set(got["event_id"]) == set(first["event_id"])


def test_throttle_partition_invariance(ray_session, null_events_c):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import throttle

    outs = []
    for parts, blocks in ((3, 1), (11, 7)):
        ds = rd.from_pandas(
            null_events_c[
                ["event_id", "user_id", "event_type", "ts", "value"]
            ]
        ).repartition(blocks)
        outs.append(
            throttle(ds, num_partitions=parts)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_first_seen_cumulative_null_parity(
    ray_session, entry_mod, null_events_c
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        first_seen_cumulative,
    )

    got = (
        first_seen_cumulative(
            rd.from_pandas(null_events_c[["user_id", "ts"]]).repartition(7),
            period_s=3600,
        )
        .to_pandas()
        .sort_values("period_start")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_c)
    want = (
        con.execute(
            entry_mod.SQL_EVENTS_NEW_USERS.replace("86400", "3600")
        )
        .df()
        .sort_values("period_start")
        .reset_index(drop=True)
    )
    # the entry twin is already parameterized at 3600; the replace is a
    # no-op safeguard if the constant changes
    assert list(got["period_start"]) == list(
        want["period_start"].astype("int64")
    )
    assert list(got["new_keys"]) == list(want["new_keys"].astype("int64"))
    assert list(got["cum_keys"]) == list(want["cum_keys"].astype("int64"))
    # the running total ends at the number of distinct non-null keys
    n_keys = null_events_c.dropna(subset=["user_id", "ts"])[
        "user_id"
    ].nunique()
    assert int(got["cum_keys"].iloc[-1]) == n_keys
    assert int(got["new_keys"].sum()) == n_keys
    assert len(got) > 1  # the scan actually had multiple periods


def test_chi2_crosstab_manual_and_sql(ray_session, entry_mod, null_events_c):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import chi2_crosstab

    got = (
        chi2_crosstab(
            rd.from_pandas(
                null_events_c[["event_type", "user_id"]]
            ).repartition(6),
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_c)
    want = (
        con.execute(entry_mod.SQL_EVENTS_CHI2)
        .df()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["bucket"]) == list(want["bucket"].astype("int64"))
    assert list(got["obs"]) == list(want["obs"].astype("int64"))
    np.testing.assert_allclose(
        _round6(got["expected"].to_numpy()), want["expected"].to_numpy(),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        _round6(got["chi2_term"].to_numpy()), want["chi2_term"].to_numpy(),
        rtol=0, atol=0,
    )
    # negative keys bucket non-negatively
    assert (got["bucket"] >= 0).all()
    # manual chi2: sum of terms equals the scipy-free formula
    d = null_events_c.dropna(subset=["event_type", "user_id"])
    ct = pd.crosstab(
        d["event_type"], d["user_id"].astype("int64") % 4
    )
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / ct.values.sum()
    manual = ((ct.values - exp) ** 2 / exp)[ct.values > 0].sum()
    assert abs(got["chi2_term"].sum() - manual) < 1e-6
