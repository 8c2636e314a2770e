"""The experimental actor-based streaming hash exchange must be
bit-identical to the sort-exchange rollup — including Gorilla points
bytes, duplicate resolution and hot-conv salting."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from light_curve_feature_ray.pipelines.rollup import (
    rollup_dataset,
    rollup_dataset_streaming,
)
from light_curve_feature_ray.sources.synth import synth_transcripts_table
from light_curve_feature_ray.stages.rollup import RollupConfig


def _sorted_pdf(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(
        drop=True
    )


def test_streaming_exchange_bit_identical(ray_session):
    table = synth_transcripts_table(n_convs=40, hot_convs=1, hot_turns=600, seed=3)
    cfg = RollupConfig(num_partitions=7, hot_threshold=None)
    ds = rd.from_arrow(table).repartition(5)
    base = _sorted_pdf(rollup_dataset(ds, cfg))
    for n_red in (2, 5):
        got = _sorted_pdf(
            rollup_dataset_streaming(
                rd.from_arrow(table).repartition(5), cfg, num_reducers=n_red
            )
        )
        pd.testing.assert_frame_equal(base, got)
        # Gorilla payload byte equality, explicitly
        assert all(
            a == b for a, b in zip(base["points"], got["points"])
        )


def test_streaming_exchange_duplicates_and_salting(ray_session):
    table = synth_transcripts_table(n_convs=12, hot_convs=1, hot_turns=400, seed=9)
    # duplicate a slice of rows (retry simulation): resolution must stay
    # (min ts, min m) regardless of exchange path
    dup = table.slice(0, table.num_rows // 3)
    both = rd.from_arrow(
        __import__("pyarrow").concat_tables([table, dup])
    ).repartition(6)
    hot = [table["conv_id"][0].as_py()]
    cfg = RollupConfig(num_partitions=5, hot_threshold=None)
    base = _sorted_pdf(rollup_dataset(both, cfg, hot_list=hot))
    got = _sorted_pdf(
        rollup_dataset_streaming(
            rd.from_arrow(
                __import__("pyarrow").concat_tables([table, dup])
            ).repartition(6),
            cfg,
            num_reducers=3,
            hot_list=hot,
        )
    )
    pd.testing.assert_frame_equal(base, got)


def test_streaming_exchange_empty_input(ray_session):
    import pyarrow as pa

    empty = synth_transcripts_table(n_convs=1, seed=1).slice(0, 0)
    out = rollup_dataset_streaming(
        rd.from_arrow(empty),
        RollupConfig(num_partitions=3, hot_threshold=None),
        num_reducers=2,
    )
    assert out.count() == 0
    # schema survives (to_pandas of an all-empty Dataset drops columns —
    # a Ray quirk, not an engine one)
    names = out.schema().names
    assert "conv_id" in names and "points" in names
