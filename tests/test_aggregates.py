"""All-aggregate analytics (pipelines/aggregates.py): per-group OLS
trend. Contracts: equals numpy polyfit per key (relative offset), NaN y
rows are skipped, singleton / zero-variance keys give NaN fits, output
is partition-invariant, timestamp and integer x columns both work."""

import numpy as np
import pandas as pd
import pytest

from light_curve_feature_ray.pipelines.aggregates import group_linear_trend


@pytest.fixture(scope="module")
def trend_df():
    rng = np.random.default_rng(9)
    n = 300
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 6, size=n).astype(np.int64),
            "t": np.sort(rng.integers(0, 1_000_000, size=n)),
            "value": rng.normal(scale=20, size=n),
        }
    )
    # key 7: singleton; key 8: two rows at the SAME x (zero variance)
    extra = pd.DataFrame(
        {"user_id": [7, 8, 8], "t": [5, 10, 10], "value": [1.0, 2.0, 4.0]}
    )
    df = pd.concat([df, extra], ignore_index=True)
    df.loc[df.index % 13 == 0, "value"] = np.nan
    df["ts"] = pd.to_datetime(df["t"] * 1_000_000, unit="us")
    return df


def test_group_linear_trend_matches_polyfit(ray_session, trend_df):
    import ray.data as rd

    ds = rd.from_pandas(trend_df[["user_id", "ts", "value"]]).repartition(5)
    got = (
        group_linear_trend(ds)
        .to_pandas()
        .sort_values("user_id")
        .set_index("user_id")
    )
    x0 = trend_df["t"].min()
    for uid, grp in trend_df.groupby("user_id"):
        ok = grp["value"].notna()
        x = (grp["t"][ok] - x0).to_numpy(dtype=np.float64)
        y = grp["value"][ok].to_numpy(dtype=np.float64)
        row = got.loc[uid]
        assert row["n"] == ok.sum()
        if ok.sum() < 2 or np.ptp(x) == 0:
            assert np.isnan(row["slope"]) and np.isnan(row["intercept"])
        else:
            slope, intercept = np.polyfit(x, y, 1)
            assert row["slope"] == pytest.approx(slope, rel=1e-6, abs=1e-12)
            assert row["intercept"] == pytest.approx(intercept, rel=1e-6)


def test_group_linear_trend_partition_invariance(ray_session, trend_df):
    import ray.data as rd

    cols = trend_df[["user_id", "ts", "value"]]
    a = (
        group_linear_trend(rd.from_pandas(cols))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    b = (
        group_linear_trend(rd.from_pandas(cols).repartition(9))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, rtol=1e-12, atol=1e-12)


def test_group_linear_trend_numeric_x(ray_session):
    import ray.data as rd

    # plain numeric x is used in its own units (no /1e6 rescale):
    # exact line y = 3x + 1
    df = pd.DataFrame(
        {
            "user_id": [1] * 5,
            "ts": np.arange(5, dtype=np.int64),
            "value": 3.0 * np.arange(5) + 1.0,
        }
    )
    got = group_linear_trend(
        rd.from_pandas(df), x_offset_us=0
    ).to_pandas()
    assert got["slope"].iloc[0] == pytest.approx(3.0, rel=1e-12)
    assert got["intercept"].iloc[0] == pytest.approx(1.0, rel=1e-12)
    # float x works too (auto offset = min)
    df["ts"] = df["ts"].astype(np.float64) + 0.5
    got2 = group_linear_trend(rd.from_pandas(df)).to_pandas()
    assert got2["slope"].iloc[0] == pytest.approx(3.0, rel=1e-9)


def test_group_corr_matches_numpy(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import group_corr

    rng = np.random.default_rng(21)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 4, size=n).astype(np.int64),
            "x": rng.normal(size=n),
        }
    )
    df["y"] = 2.0 * df["x"] + rng.normal(scale=0.5, size=n)
    df.loc[df.index % 11 == 0, "y"] = np.nan  # NULL pairs skipped
    # key 9: constant x (zero variance -> NaN)
    df = pd.concat(
        [df, pd.DataFrame({"k": [9, 9, 9], "x": [1.0] * 3, "y": [1, 2, 3.0]})],
        ignore_index=True,
    )
    got = (
        group_corr(
            rd.from_pandas(df).repartition(6), key_col="k", x_col="x", y_col="y"
        )
        .to_pandas()
        .set_index("k")
    )
    for k, grp in df.groupby("k"):
        ok = grp["y"].notna()
        row = got.loc[k]
        assert row["n"] == ok.sum()
        x, y = grp["x"][ok].to_numpy(), grp["y"][ok].to_numpy()
        if ok.sum() < 2 or np.ptp(x) == 0 or np.ptp(y) == 0:
            assert np.isnan(row["corr"])
        else:
            want = np.corrcoef(x, y)[0, 1]
            assert row["corr"] == pytest.approx(want, rel=1e-9)


def test_last_value_per_key_matches_pandas(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        last_value_per_key,
    )

    rng = np.random.default_rng(31)
    n = 250
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 8, size=n).astype(np.int64),
            "t": rng.integers(0, 50, size=n),  # many duplicate timestamps
            "value": rng.normal(size=n),
        }
    )
    df["ts"] = pd.to_datetime(df["t"] * 1_000_000, unit="us")
    got = (
        last_value_per_key(
            rd.from_pandas(df[["event_id", "user_id", "ts", "value"]])
            .repartition(6),
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["user_id", "t", "event_id"])
        .groupby("user_id")
        .tail(1)
        .sort_values("user_id")
    )
    assert list(got["user_id"]) == list(want["user_id"])
    np.testing.assert_array_equal(
        got["t_us"].to_numpy(), want["t"].to_numpy() * 1_000_000
    )
    np.testing.assert_array_equal(
        got["value"].to_numpy(), want["value"].to_numpy()
    )


def test_unpivot_matches_melt(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.pivot import unpivot

    df = pd.DataFrame(
        {
            "k": np.arange(6, dtype=np.int64),
            "a": [1.0, 2.0, np.nan, 4.0, 5.0, 6.0],
            "b": np.arange(6, dtype=np.float64) * 10,
        }
    )
    got = (
        unpivot(
            rd.from_pandas(df).repartition(3),
            id_cols=["k"],
            value_cols=["a", "b"],
        )
        .to_pandas()
        .sort_values(["k", "name"])
        .reset_index(drop=True)
    )
    want = (
        df.melt(id_vars=["k"], value_vars=["a", "b"], var_name="name")
        .sort_values(["k", "name"])
        .reset_index(drop=True)
    )
    assert list(got["k"]) == list(want["k"])
    assert list(got["name"]) == list(want["name"])
    np.testing.assert_array_equal(
        got["value"].to_numpy(), want["value"].to_numpy()
    )
    with pytest.raises(ValueError):
        unpivot(rd.from_pandas(df), id_cols=["k"], value_cols=[])


def test_grouping_sets_matches_pandas(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        grouping_sets_agg,
    )

    rng = np.random.default_rng(13)
    n = 400
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], size=n),
            "b": rng.integers(0, 4, size=n).astype(np.int64),
            "value": rng.normal(size=n),
        }
    )
    df.loc[df.index % 8 == 0, "value"] = np.nan
    sets = [("a", "b"), ("a",), ()]
    got = (
        grouping_sets_agg(
            rd.from_pandas(df).repartition(5), sets=sets, value_col="value"
        )
        .to_pandas()
        .sort_values(["grouping_id", "a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # reference per set
    for s, gid_want in ((("a", "b"), 0), (("a",), 1), ((), 3)):
        sub = got[got.grouping_id == gid_want]
        if s:
            ref = (
                df.assign(_ok=df.value.notna())
                .groupby([*s])
                .agg(n=("_ok", "sum"), sv=("value", "sum"))
                .reset_index()
            )
            assert len(sub) == len(ref)
            ref_idx = ref.set_index([*s])
            for _, row in sub.iterrows():
                key = tuple(
                    row[c] if c == "a" else int(row[c]) for c in s
                )
                key = key[0] if len(key) == 1 else key
                r = ref_idx.loc[key]
                assert row["n"] == r["n"]
                assert row["sum_value"] == pytest.approx(r["sv"], rel=1e-9)
        else:
            assert len(sub) == 1
            assert sub["n"].iloc[0] == int(df.value.notna().sum())
            assert sub["sum_value"].iloc[0] == pytest.approx(
                df.value.sum(), rel=1e-9
            )
    # partition invariance
    again = (
        grouping_sets_agg(
            rd.from_pandas(df).repartition(11), sets=sets, value_col="value"
        )
        .to_pandas()
        .sort_values(["grouping_id", "a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again, rtol=1e-12, atol=1e-12)
    with pytest.raises(ValueError):
        grouping_sets_agg(rd.from_pandas(df), sets=[("a", "a")])


def test_group_count_distinct(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        group_count_distinct,
    )

    rng = np.random.default_rng(19)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], size=n),
            "v": rng.integers(0, 40, size=n).astype("float64"),
        }
    )
    df.loc[df.index % 9 == 0, "v"] = np.nan  # nulls don't count
    got = (
        group_count_distinct(
            rd.from_pandas(df).repartition(7), key_col="k", value_col="v"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.dropna(subset=["v"]).groupby("k")["v"].nunique().sort_index()
    )
    assert list(got["k"]) == list(want.index)
    assert list(got["n_distinct"]) == list(want.values)


def test_group_mode(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import group_mode

    rng = np.random.default_rng(23)
    n = 800
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, size=n).astype(np.int64),
            "v": rng.choice(list("abcde"), size=n),
        }
    )
    df.loc[df.index % 11 == 0, "v"] = None  # null values don't count

    def want_frame(frame):
        c = (
            frame.dropna(subset=["v"])
            .groupby(["k", "v"])
            .size()
            .reset_index(name="cnt")
        )
        # max count, ties -> lexicographically smallest value
        c = c.sort_values(["k", "cnt", "v"], ascending=[True, False, True])
        top = c.groupby("k").first().reset_index()
        top["n_values"] = (
            c.groupby("k")["v"].count().reindex(top["k"]).to_numpy()
        )
        return top

    want = want_frame(df)
    got = (
        group_mode(
            rd.from_pandas(df).repartition(7), key_col="k", value_col="v"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got["k"]) == list(want["k"])
    assert list(got["mode_value"]) == list(want["v"])
    assert list(got["mode_count"]) == list(want["cnt"])
    assert list(got["n_values"]) == list(want["n_values"])
    # partition invariance (the tie rule must not depend on layout)
    again = (
        group_mode(
            rd.from_pandas(df).repartition(23), key_col="k", value_col="v"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
