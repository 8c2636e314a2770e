"""Outputs must be independent of partitioning/parallelism choices —
the property that makes retries, resumes and cluster-size changes safe."""

import numpy as np
import pandas as pd
import pytest

from light_curve_feature_ray.sources.synth import synth_transcripts_parquet
from light_curve_feature_ray.stages.rollup import RollupConfig

CFG = dict(n_convs=15, mean_turns=35, hot_convs=1, hot_turns=200, seed=77)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    return synth_transcripts_parquet(
        str(tmp_path_factory.mktemp("pinv") / "in"), shards=3, **CFG
    )


def run(synth_dir, num_partitions):
    from light_curve_feature_ray.pipelines.rollup import (
        read_transcripts,
        rollup_dataset,
    )

    cfg = RollupConfig(
        features=("observation_count", "mean", "standard_deviation", "eta"),
        num_partitions=num_partitions,
        hot_threshold=None,
        store_points=True,
    )
    df = rollup_dataset(read_transcripts(synth_dir), cfg).to_pandas()
    return df.sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(drop=True)


def test_partition_count_invariance(ray_session, synth_dir):
    a = run(synth_dir, 3)
    b = run(synth_dir, 16)
    assert len(a) == len(b)
    for col in a.columns:
        if a[col].dtype == object and col == "points":
            assert (a[col].values == b[col].values).all(), "points bytes differ"
        elif a[col].dtype.kind == "f":
            np.testing.assert_allclose(
                a[col].to_numpy(), b[col].to_numpy(), equal_nan=True, rtol=0
            )
        else:
            assert (a[col].values == b[col].values).all(), col


def test_rerun_bit_identical(ray_session, synth_dir):
    a = run(synth_dir, 8)
    b = run(synth_dir, 8)
    pd.testing.assert_frame_equal(a, b)


# --- salted path: hot convs spread across partitions by salt window ------

SALT_CFG = dict(n_convs=12, mean_turns=30, hot_convs=2, hot_turns=3000, seed=99)


@pytest.fixture(scope="module")
def salted_dir(tmp_path_factory):
    # hot convs span multiple days (3000 turns x ~45 s + injected gaps), so
    # they cover several 1-day salt windows
    return synth_transcripts_parquet(
        str(tmp_path_factory.mktemp("pinv_salt") / "in"), shards=3, **SALT_CFG
    )


def run_salted(salted_dir, num_partitions):
    from light_curve_feature_ray.pipelines.rollup import (
        read_transcripts,
        rollup_dataset,
    )

    cfg = RollupConfig(
        features=("observation_count", "mean", "standard_deviation", "eta"),
        num_partitions=num_partitions,
        hot_threshold=500,  # the 2 hot convs (3000 turns) get salted
        gap_fill="linear",
        store_points=True,
    )
    df = rollup_dataset(read_transcripts(salted_dir), cfg).to_pandas()
    return df.sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(drop=True)


def test_salted_partition_count_invariance(ray_session, salted_dir):
    """Gap-fill truncates at salt-window boundaries for hot convs, so the
    output must not depend on which salt windows co-hash into a partition
    (i.e. on num_partitions)."""
    a = run_salted(salted_dir, 3)
    b = run_salted(salted_dir, 16)
    assert len(a) == len(b)
    for col in a.columns:
        if a[col].dtype == object and col == "points":
            assert (a[col].values == b[col].values).all(), "points bytes differ"
        elif a[col].dtype.kind == "f":
            np.testing.assert_allclose(
                a[col].to_numpy(), b[col].to_numpy(), equal_nan=True, rtol=0
            )
        else:
            assert (a[col].values == b[col].values).all(), col
