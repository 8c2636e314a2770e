"""Sliding/session window operators on tiny synthetic event logs."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tiny_events(ray_session):
    import ray.data as rd

    # user 1: events at 0s, 10s, 2000s (session gap > 1800 between 10->2000)
    # user 2: single event
    rows = [
        (1, 0, 1.0),
        (1, 10, 2.0),
        (1, 2000, 3.0),
        (2, 500, 10.0),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "t", "value"])
    df["ts"] = pd.to_datetime(df["t"] * 1_000_000, unit="us")
    return rd.from_pandas(df[["user_id", "ts", "value"]])


def test_session_windows(tiny_events):
    from light_curve_feature_ray.pipelines.windows import session_windows

    out = (
        session_windows(tiny_events, gap_s=1800, num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    u1 = out[out["user_id"] == 1]
    assert list(u1["session_idx"]) == [0, 1]
    assert list(u1["n"]) == [2, 1]
    assert list(u1["session_start"]) == [0, 2000]
    assert list(u1["session_end"]) == [10, 2000]
    np.testing.assert_allclose(u1["sum_value"].to_numpy(), [3.0, 3.0])
    u2 = out[out["user_id"] == 2]
    assert list(u2["n"]) == [1] and list(u2["session_start"]) == [500]


def test_sliding_windows(tiny_events):
    from light_curve_feature_ray.pipelines.windows import sliding_window_agg

    out = (
        sliding_window_agg(
            tiny_events, window_s=3600, slide_s=900, num_partitions=4
        )
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    # event at t=0 belongs to windows starting at -2700, -1800, -900, 0
    u1 = out[out["user_id"] == 1]
    w0 = u1[u1["window_start"] == 0].iloc[0]
    assert w0["n"] == 3  # t=0, 10, 2000 all within [0, 3600)
    np.testing.assert_allclose(w0["sum_value"], 6.0)
    w_neg = u1[u1["window_start"] == -2700].iloc[0]
    assert w_neg["n"] == 2  # t=0 and t=10 (2000 >= -2700+3600=900? 2000>900 no)
    # window [-900, 2700): contains all three events
    w9 = u1[u1["window_start"] == -900].iloc[0]
    assert w9["n"] == 3
    # every event appears in exactly 4 windows
    assert int(u1["n"].sum()) == 3 * 4


def _rolling_events(n=600, seed=11):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 25, size=n).astype(np.int64),
            "value": rng.normal(size=n),
        }
    )
    # duplicate timestamps within a user exercise the (ts, id) tie-break
    t_us = rng.integers(0, 5_000, size=n) * 1_000_000
    df["ts"] = pd.to_datetime(t_us, unit="us")
    df.loc[rng.random(n) < 0.05, "value"] = np.nan  # SQL-NULL analogue
    return df


def _rolling_reference(df, k):
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = df.groupby("user_id")["value"]
    out = pd.DataFrame(
        {
            "event_id": df["event_id"],
            "rolling_n": g.rolling(k, min_periods=1).count().to_numpy(),
            "rolling_sum": g.rolling(k, min_periods=1).sum().to_numpy(),
            "rolling_mean": g.rolling(k, min_periods=1).mean().to_numpy(),
            "rolling_min": g.rolling(k, min_periods=1).min().to_numpy(),
            "rolling_max": g.rolling(k, min_periods=1).max().to_numpy(),
            "lag_value": g.shift(1).to_numpy(),
        }
    )
    t_us = df["ts"].astype("datetime64[us]").astype("int64")
    out["delta_t_us"] = t_us.groupby(df["user_id"]).diff().to_numpy()
    return out.sort_values("event_id").reset_index(drop=True)


@pytest.mark.parametrize("k,parts", [(1, 4), (5, 4), (5, 13), (50, 4)])
def test_rolling_agg_matches_pandas(ray_session, k, parts):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import rolling_agg

    df = _rolling_events()
    out = (
        rolling_agg(rd.from_pandas(df), k=k, num_partitions=parts)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = _rolling_reference(df, k)
    assert np.array_equal(out["rolling_n"].to_numpy(), ref["rolling_n"].to_numpy())
    for c in ("rolling_sum", "rolling_mean", "rolling_min", "rolling_max"):
        np.testing.assert_allclose(
            out[c].to_numpy(), ref[c].to_numpy(), rtol=1e-12, atol=1e-12,
            err_msg=c,
        )
    # pandas rolling sum over an all-NaN window yields 0.0 with count 0;
    # ours (and SQL) yield NULL there — already normalized by the n>0 mask
    np.testing.assert_allclose(
        out["lag_value"].to_numpy(), ref["lag_value"].to_numpy(), equal_nan=True
    )
    np.testing.assert_allclose(
        out["delta_t_us"].to_numpy(), ref["delta_t_us"].to_numpy(), equal_nan=True
    )
    np.testing.assert_allclose(
        out["delta_value"].to_numpy(),
        df.set_index("event_id")["value"].reindex(out["event_id"]).to_numpy()
        - ref["lag_value"].to_numpy(),
        equal_nan=True,
    )


def test_rolling_agg_k_validation(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import rolling_agg

    with pytest.raises(ValueError):
        rolling_agg(rd.from_pandas(_rolling_events(10)), k=0)


@pytest.mark.parametrize("parts", [4, 11])
def test_rolling_time_agg_matches_pandas(ray_session, parts):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import rolling_time_agg

    df = _rolling_events(400, seed=19)
    # force same-timestamp peers within a user (RANGE peer semantics)
    df.loc[5:15, "ts"] = df.loc[5, "ts"]
    df.loc[5:15, "user_id"] = 3
    out = (
        rolling_time_agg(
            rd.from_pandas(df), window_s=600, num_partitions=parts
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # reference: per-row scan over the same key with t in [t-600s, t]
    t_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    k = df["user_id"].to_numpy()
    v = df["value"].to_numpy()
    ref_n = np.zeros(len(df), dtype=np.int64)
    ref_sum = np.full(len(df), np.nan)
    for i in range(len(df)):
        m = (k == k[i]) & (t_us >= t_us[i] - 600_000_000) & (t_us <= t_us[i])
        vals = v[m]
        vals = vals[~np.isnan(vals)]
        ref_n[i] = len(vals)
        if len(vals):
            ref_sum[i] = vals.sum()
    got = out.set_index("event_id")
    ids = df["event_id"].to_numpy()
    assert np.array_equal(got.loc[ids, "rolling_n"].to_numpy(), ref_n)
    np.testing.assert_allclose(
        got.loc[ids, "rolling_sum"].to_numpy(), ref_sum, equal_nan=True
    )
    np.testing.assert_allclose(
        got.loc[ids, "rolling_mean"].to_numpy(),
        ref_sum / np.where(ref_n > 0, ref_n, np.nan),
        equal_nan=True,
    )


def test_rolling_time_agg_validation(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import rolling_time_agg

    with pytest.raises(ValueError):
        rolling_time_agg(rd.from_pandas(_rolling_events(10)), window_s=0)


def _naive_ewma(values, alpha):
    out, e = [], None
    for v in values:
        if np.isnan(v):
            out.append(np.nan)
            continue
        e = v if e is None else e + alpha * (v - e)
        out.append(e)
    return out


def test_ewma_matches_naive(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import ewma

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 7, size=n).astype(np.int64),
            "t": np.sort(rng.integers(0, 10_000, size=n)),
            "value": rng.normal(scale=50, size=n),
        }
    )
    df.loc[df.index % 17 == 0, "value"] = np.nan  # nulls carry no weight
    df["ts"] = pd.to_datetime(df["t"] * 1_000_000, unit="us")
    ds = rd.from_pandas(
        df[["event_id", "user_id", "ts", "value"]]
    ).repartition(5)
    got = (
        ewma(ds, alpha=0.25, num_partitions=8)
        .to_pandas()
        .sort_values(["user_id", "t_us", "event_id"])
    )
    for uid, grp in got.groupby("user_id"):
        want = _naive_ewma(grp["value"].to_numpy(), 0.25)
        np.testing.assert_array_equal(  # bit parity, incl. NaN rows
            grp["ewma"].to_numpy(), np.array(want)
        )


def test_ewma_partition_invariance_and_validation(tiny_events):
    from light_curve_feature_ray.pipelines.windows import ewma

    base = (
        ewma(tiny_events, id_col="value", num_partitions=2)
        .to_pandas()
        .sort_values(["user_id", "t_us"])
        .reset_index(drop=True)
    )
    again = (
        ewma(tiny_events.repartition(3), id_col="value", num_partitions=9)
        .to_pandas()
        .sort_values(["user_id", "t_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, again)
    with pytest.raises(ValueError):
        ewma(tiny_events, id_col="value", alpha=0.0)


def test_rolling_zscore_matches_naive(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import rolling_zscore

    rng = np.random.default_rng(6)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 5, size=n).astype(np.int64),
            "t": np.sort(rng.integers(0, 10_000, size=n)),
            "value": rng.normal(scale=10, size=n),
        }
    )
    df.loc[df.index % 9 == 0, "value"] = np.nan
    df["ts"] = pd.to_datetime(df["t"] * 1_000_000, unit="us")
    k = 4
    got = (
        rolling_zscore(
            rd.from_pandas(df[["event_id", "user_id", "ts", "value"]])
            .repartition(4),
            k=k,
            num_partitions=7,
        )
        .to_pandas()
        .sort_values(["user_id", "t_us", "event_id"])
    )
    for uid, grp in got.groupby("user_id"):
        vals = grp["value"].to_numpy()
        for i in range(len(vals)):
            w = vals[max(0, i - k + 1) : i + 1]
            w = w[~np.isnan(w)]
            z = grp["zscore"].iloc[i]
            nw = grp["n_w"].iloc[i]
            assert nw == len(w)
            if len(w) < 2 or np.std(w, ddof=1) == 0 or np.isnan(vals[i]):
                assert np.isnan(z)
            else:
                want = (vals[i] - w.mean()) / np.std(w, ddof=1)
                assert z == pytest.approx(want, rel=1e-9)

    with pytest.raises(ValueError):
        rolling_zscore(rd.from_pandas(df), k=1)


def test_rolling_zscore_large_offset_stable(ray_session):
    """Large-mean/low-variance windows (1e8 + N(0, 1e-3)): the textbook
    s2 - n*mean^2 prefix-sum form catastrophically cancels here (z off
    by 1000x); the segment-baseline shift must agree with the two-pass
    (SQL stddev_samp-style) answer to full precision."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import rolling_zscore

    rng = np.random.default_rng(42)
    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 3, size=n).astype(np.int64),
            "ts": pd.to_datetime(np.arange(n) * 1_000_000, unit="us"),
            "value": 1e8 + rng.normal(scale=1e-3, size=n),
        }
    )
    k = 5
    got = (
        rolling_zscore(rd.from_pandas(df).repartition(3), k=k, num_partitions=5)
        .to_pandas()
        .sort_values(["user_id", "t_us", "event_id"])
    )
    n_checked = 0
    for _, grp in got.groupby("user_id"):
        vals = grp["value"].to_numpy()
        for i in range(len(vals)):
            w = vals[max(0, i - k + 1) : i + 1]
            z = grp["zscore"].iloc[i]
            if len(w) < 2:
                assert np.isnan(z)
                continue
            # naive np.std on raw 1e8-magnitude values is itself ~5e-5
            # off (mean rounds at ulp(1e8)); shift first for the truth
            ws = w - w[0]
            want = (ws[-1] - ws.mean()) / np.std(ws, ddof=1)
            assert z == pytest.approx(want, rel=1e-9, abs=1e-9)
            n_checked += 1
    assert n_checked > 100


def test_running_agg_matches_pandas(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import running_agg

    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 6, size=n).astype(np.int64),
            "t": np.sort(rng.integers(0, 10_000, size=n)),
            "value": rng.normal(scale=10, size=n),
        }
    )
    df.loc[df.index % 8 == 0, "value"] = np.nan
    df["ts"] = pd.to_datetime(df["t"] * 1_000_000, unit="us")
    got = (
        running_agg(
            rd.from_pandas(df[["event_id", "user_id", "ts", "value"]])
            .repartition(5),
            num_partitions=7,
        )
        .to_pandas()
        .sort_values(["user_id", "t_us", "event_id"])
    )
    for uid, grp in got.groupby("user_id"):
        v = grp["value"].to_numpy()
        ok = ~np.isnan(v)
        want_n = np.cumsum(ok)
        want_sum = np.cumsum(np.where(ok, v, 0.0))
        want_max = pd.Series(np.where(ok, v, -np.inf)).cummax().to_numpy()
        np.testing.assert_array_equal(grp["run_n"].to_numpy(), want_n)
        mask = want_n > 0
        np.testing.assert_allclose(
            grp["run_sum"].to_numpy()[mask], want_sum[mask], rtol=1e-12
        )
        np.testing.assert_allclose(
            grp["run_max"].to_numpy()[mask], want_max[mask], rtol=1e-12
        )
        assert np.isnan(grp["run_sum"].to_numpy()[~mask]).all()


def test_funnel_steps_matches_naive(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import funnel_steps

    rng = np.random.default_rng(31)
    n = 600
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, size=n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**7, size=n) * 1_000_000, unit="us"
            ),
            "event_type": rng.choice(["a", "b", "c", "x"], size=n),
        }
    )
    steps = ("a", "b", "c")

    def naive(frame):
        rows = []
        for uid, g in frame.groupby("user_id"):
            g = g.sort_values("ts")
            tprev = pd.Timestamp.min
            ts_out, done = [], 0
            reached = True
            for s in steps:
                cand = g[(g["event_type"] == s) & (g["ts"] > tprev)]
                if reached and len(cand):
                    tk = cand["ts"].min()
                    ts_out.append(tk)
                    tprev = tk
                    done += 1
                else:
                    reached = False
                    ts_out.append(pd.NaT)
            rows.append([uid, *ts_out, done])
        return pd.DataFrame(
            rows, columns=["user_id", "t1", "t2", "t3", "steps_completed"]
        )

    want = naive(df).sort_values("user_id").reset_index(drop=True)
    for c in ("t1", "t2", "t3"):
        want[c] = want[c].astype("datetime64[us]")
    got = (
        funnel_steps(rd.from_pandas(df).repartition(6), steps=steps)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"steps_completed": "int64"}), want
    )
    # partition invariance
    again = (
        funnel_steps(rd.from_pandas(df).repartition(17), steps=steps)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
    with pytest.raises(ValueError):
        funnel_steps(rd.from_pandas(df), steps=())


def test_funnel_steps_strict_order(ray_session):
    """An equal-timestamp next step does NOT count (strict >), matching
    the SQL twin's e.ts > prev; steps can reuse later events."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import funnel_steps

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": [
                t0,
                t0,  # same-instant 'b' must NOT complete step 2
                t0 + pd.Timedelta(seconds=5),
                t0,
                t0 + pd.Timedelta(seconds=1),
            ],
            "event_type": ["a", "b", "b", "b", "a"],
        }
    )
    got = (
        funnel_steps(rd.from_pandas(df), steps=("a", "b"))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got["steps_completed"]) == [2, 1]
    assert got.loc[0, "t2"] == t0 + pd.Timedelta(seconds=5)
    assert pd.isna(got.loc[1, "t2"])  # user 2: 'b' BEFORE 'a' doesn't count


def test_state_intervals_matches_pandas_lead(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import state_intervals

    rng = np.random.default_rng(37)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 10, size=n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, size=n) * 1_000_000, unit="us"
            ),
            "event_type": rng.choice(["on", "off", "idle"], size=n),
        }
    )
    # duplicate timestamps to exercise the id tie-break
    df.loc[5, "ts"] = df.loc[4, "ts"]
    df.loc[5, "user_id"] = df.loc[4, "user_id"]
    got = (
        state_intervals(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values(["user_id", "valid_from", "event_id"])
        .reset_index(drop=True)
    )
    w = df.sort_values(["user_id", "ts", "event_id"]).copy()
    w["valid_to"] = (
        w.groupby("user_id")["ts"].shift(-1).astype("datetime64[us]")
    )
    w["is_current"] = w["valid_to"].isna()
    w["valid_to"] = w["valid_to"].fillna(
        pd.Timestamp("9999-12-31").as_unit("us")
    )
    w = w.rename(columns={"event_type": "state", "ts": "valid_from"})[
        ["user_id", "event_id", "state", "valid_from", "valid_to",
         "is_current"]
    ].reset_index(drop=True)
    w["valid_from"] = w["valid_from"].astype("datetime64[us]")
    w["valid_to"] = w["valid_to"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, w)
    # exactly one open interval per key
    assert got.groupby("user_id")["is_current"].sum().eq(1).all()
