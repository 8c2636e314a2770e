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
