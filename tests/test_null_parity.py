"""Null-input parity between operators and their driver SQL oracles.

The shipped testdata has no NULL values in events.value / lineitem /
embeddings, so the driver's oracle gate can't exercise null semantics.
These tests re-run the ACTUAL oracle SQL from __ray_entry__ over
synthetic null-bearing tables in DuckDB and compare against the
operators — pinning the ignore-nulls / drop-pair / skip-row contracts
the round-3 review flagged as latent divergences."""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", "__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _round6(v):
    v = np.asarray(v, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(v) * 1e6 + 0.5) / 1e6, v)
    return np.where(np.isnan(v), np.nan, out)


def _cmp_float(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    na, nb = np.isnan(a), np.isnan(b)
    assert (na == nb).all()
    np.testing.assert_allclose(a[~na], b[~nb], rtol=1e-9, atol=1e-9)


@pytest.fixture(scope="module")
def null_events():
    rng = np.random.default_rng(5)
    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 5, size=n).astype(np.int64),
            "value": rng.normal(scale=30, size=n),
        }
    )
    df.loc[df.index % 7 == 0, "value"] = np.nan  # ~14% nulls
    df.loc[df.user_id == 4, "value"] = np.nan  # one all-null user
    # the FIRST row of user 3 is null (poisons a naive recursion)
    first3 = df.index[df.user_id == 3][0]
    df.loc[first3, "value"] = np.nan
    df["ts"] = pd.to_datetime(
        np.sort(rng.integers(0, 10**9, size=n)) * 1000, unit="us"
    )
    return df[["event_id", "user_id", "ts", "value"]]


def test_ewma_oracle_null_parity(ray_session, entry_mod, null_events):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import ewma

    got = (
        ewma(rd.from_pandas(null_events), alpha=entry_mod.EWMA_ALPHA)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events)
    want = (
        con.execute(entry_mod.SQL_EVENTS_EWMA)
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == len(null_events)
    _cmp_float(_round6(got["ewma"]), want["ewma"])
    _cmp_float(_round6(got["value"]), want["value"])


def test_trend_oracle_null_parity(ray_session, entry_mod, null_events):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        group_linear_trend,
    )

    got = (
        group_linear_trend(
            rd.from_pandas(null_events[["user_id", "ts", "value"]])
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events)
    want = (
        con.execute(entry_mod.SQL_EVENTS_USER_TREND)
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # the all-null user is absent on BOTH sides
    assert list(got["user_id"]) == list(want["user_id"])
    assert 4 not in set(got["user_id"])
    assert list(got["n"]) == list(want["n"])
    _cmp_float(_round6(got["slope"]), want["slope"])
    _cmp_float(_round6(got["intercept"]), want["intercept"])


def test_corr_oracle_null_parity(ray_session, entry_mod):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import group_corr

    rng = np.random.default_rng(8)
    n = 150
    df = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "N", "R"], size=n),
            "l_quantity": rng.integers(1, 50, size=n).astype(np.float64),
        }
    )
    df["l_extendedprice"] = df["l_quantity"] * 1000 + rng.normal(
        scale=500, size=n
    )
    df.loc[df.index % 6 == 0, "l_extendedprice"] = np.nan
    df.loc[df.index % 11 == 0, "l_quantity"] = np.nan
    got = (
        group_corr(
            rd.from_pandas(df),
            key_col="l_returnflag",
            x_col="l_quantity",
            y_col="l_extendedprice",
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("lineitem", df)
    want = (
        con.execute(entry_mod.SQL_LINEITEM_CORR)
        .df()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert list(got["l_returnflag"]) == list(want["l_returnflag"])
    assert list(got["n"]) == list(want["n"])
    _cmp_float(_round6(got["corr"]), want["corr"])


def test_group_centroid_null_and_fixed_size_list(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.similarity import group_centroid

    rng = np.random.default_rng(4)
    emb = rng.normal(size=(40, 8)).astype(np.float32)
    labels = np.repeat(np.arange(4, dtype=np.int32), 10)
    lists = [None if i % 9 == 0 else list(row) for i, row in enumerate(emb)]
    for typ in (
        pa.list_(pa.float32()),
        pa.list_(pa.float32(), 8),  # fixed_size_list
    ):
        tbl = pa.table(
            {"label": pa.array(labels), "embedding": pa.array(lists, type=typ)}
        )
        got = (
            group_centroid(rd.from_arrow(tbl).repartition(3))
            .to_pandas()
            .sort_values(["label", "dim"])
            .reset_index(drop=True)
        )
        mask = np.array([v is not None for v in lists])
        for lab in range(4):
            sel = mask & (labels == lab)
            want = emb[sel].astype(np.float64).mean(axis=0)
            rows = got[got.label == lab]
            assert list(rows.n_vectors) == [int(sel.sum())] * 8
            np.testing.assert_allclose(
                rows.centroid.to_numpy(), want, rtol=1e-12
            )
