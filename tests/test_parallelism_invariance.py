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


def test_packed_exchange_bit_identical(ray_session, synth_dir):
    """The list-packed exchange (pack_derived/unpack_packed) must yield
    byte-identical output to the row exchange — including Gorilla points
    bytes — at any partition count, tasks or actor pool."""
    from light_curve_feature_ray.pipelines.rollup import (
        read_transcripts,
        rollup_dataset,
    )

    cfg = RollupConfig(
        features=("observation_count", "mean", "standard_deviation", "eta"),
        num_partitions=5,
        hot_threshold=None,
        store_points=True,
    )
    base = (
        rollup_dataset(read_transcripts(synth_dir), cfg, packed_exchange=False)
        .to_pandas()
        .sort_values(["conv_id", "tier", "bucket_ts"])
        .reset_index(drop=True)
    )
    packed = (
        rollup_dataset(read_transcripts(synth_dir), cfg, packed_exchange=True)
        .to_pandas()
        .sort_values(["conv_id", "tier", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, packed)
    packed_actors = (
        rollup_dataset(
            read_transcripts(synth_dir),
            cfg,
            packed_exchange=True,
            worker_concurrency=2,
        )
        .to_pandas()
        .sort_values(["conv_id", "tier", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, packed_actors)


def test_packed_exchange_salted_and_dups(ray_session, salted_dir):
    """Packed exchange under hot-conv salting AND cross-block duplicate
    rows: dedup happens at the worker after unpack, so the (min ts,
    min m) duplicate rule must survive packing."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.rollup import (
        read_transcripts,
        rollup_dataset,
    )

    cfg = RollupConfig(
        features=("observation_count", "mean"),
        num_partitions=4,
        hot_threshold=500,
        store_points=True,
    )

    def run_variant(packed):
        return (
            rollup_dataset(
                read_transcripts(salted_dir), cfg, packed_exchange=packed
            )
            .to_pandas()
            .sort_values(["conv_id", "tier", "bucket_ts"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run_variant(False), run_variant(True))

    # duplicates in different blocks (retry shape): same (conv, turn)
    # twice with different (ts, m) — packed must resolve identically
    df = pd.DataFrame(
        {
            "conv_id": ["x"] * 4 + ["y"] * 2,
            "turn_idx": [0, 1, 1, 2, 0, 0],
            "text": ["aa", "bbb", "c", "dddd", "ee", "fff"],
            "ts": pd.to_datetime(
                [1_000_000, 61_000_000, 60_500_000, 121_000_000, 5_000_000, 4_000_000],
                unit="us",
            ),
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    cfg2 = RollupConfig(
        features=("observation_count", "mean"),
        tiers=("1m",),
        num_partitions=2,
        hot_threshold=None,
        store_points=True,
    )
    a = (
        rollup_dataset(ds, cfg2, packed_exchange=False)
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    b = (
        rollup_dataset(ds, cfg2, packed_exchange=True)
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
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
