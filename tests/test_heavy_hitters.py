"""Misra-Gries + exact-rescore heavy hitters (pipelines/sketches.py):
exactness vs a plain GROUP BY ... HAVING, partition invariance (the MG
truncation is per-block, but the rescore is exact), the candidate-bound
guarantee, and the loud parameter errors."""

import numpy as np
import pandas as pd
import pytest


def _zipf_frame(n=30000, seed=5):
    rng = np.random.default_rng(seed)
    # heavy-tailed: a few very frequent ids over a wide distinct domain
    ids = rng.zipf(1.3, n) % 5000
    return pd.DataFrame({"v": ids.astype(np.int64)})


def _exact(df, min_frac):
    import math

    thr = math.ceil(min_frac * len(df))
    vc = df["v"].value_counts()
    return vc[vc >= thr].sort_index()


@pytest.mark.parametrize("parts", [1, 13])
def test_exact_vs_pandas_and_partition_invariant(ray_session, parts):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import heavy_hitters

    df = _zipf_frame()
    ds = rd.from_pandas(df).repartition(parts)
    got = (
        heavy_hitters(ds, "v", min_frac=0.005)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    exp = _exact(df, 0.005)
    assert got["v"].tolist() == exp.index.tolist()
    assert got["cnt"].tolist() == exp.tolist()


def test_small_k_still_exact_when_valid(ray_session):
    """k exactly at the 2/min_frac guarantee boundary stays exact."""
    import math

    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import heavy_hitters

    df = _zipf_frame(seed=9)
    ds = rd.from_pandas(df).repartition(7)
    k = int(math.ceil(2.0 / 0.01))
    got = (
        heavy_hitters(ds, "v", min_frac=0.01, k=k)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    exp = _exact(df, 0.01)
    assert got["v"].tolist() == exp.index.tolist()
    assert got["cnt"].tolist() == exp.tolist()


def test_string_keys_and_nulls(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import heavy_hitters

    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + [None] * 15
    df = pd.DataFrame({"v": vals})
    ds = rd.from_pandas(df).repartition(4)
    got = (
        heavy_hitters(ds, "v", min_frac=0.3)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    # threshold = ceil(0.3 * 85 non-null) = 26: only 'a' and 'b'
    assert got["v"].tolist() == ["a", "b"]
    assert got["cnt"].tolist() == [50, 30]


def test_loud_errors(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import heavy_hitters

    ds = rd.from_pandas(_zipf_frame(n=500))
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(ds, "v", min_frac=1.5)
    with pytest.raises(ValueError, match="too small"):
        heavy_hitters(ds, "v", min_frac=0.01, k=5)
