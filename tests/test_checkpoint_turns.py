"""Checkpointed job (resume skips finished partitions) and turn-level
invariants (byte-exact text, stable order, dedup)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from light_curve_feature_ray.sources.synth import (
    synth_transcripts_parquet,
    synth_transcripts_table,
)
from light_curve_feature_ray.stages.rollup import RollupConfig

CFG = dict(n_convs=20, mean_turns=30, hot_convs=0, seed=21)


@pytest.fixture()
def synth_dir(tmp_path):
    return synth_transcripts_parquet(str(tmp_path / "in"), shards=3, **CFG)


def test_job_writes_manifests_and_resumes(ray_session, synth_dir, tmp_path):
    from light_curve_feature_ray.state.checkpoint import (
        completed_partitions,
        read_rollup_output,
        run_rollup_job,
    )

    out = str(tmp_path / "out")
    cfg = RollupConfig(
        features=("observation_count", "mean"),
        num_partitions=6,
        store_points=False,
        hot_threshold=None,
    )
    summary = run_rollup_job(synth_dir, out, cfg)
    parts = completed_partitions(out)
    assert parts == set(summary["partitions_written"])
    assert summary["rows_written"] > 0
    # manifests carry lineage + metrics
    p = sorted(parts)[0]
    with open(os.path.join(out, f"part={p}", "_manifest.json")) as f:
        man = json.load(f)
    assert man["rows"] > 0 and man["bytes"] > 0
    assert man["lineage"]["input"] == synth_dir
    assert "1m" in man["tiers"]

    total_rows = read_rollup_output(out).count()

    # simulate a partial failure: delete one partition's manifest, resume
    victim = sorted(parts)[0]
    os.remove(os.path.join(out, f"part={victim}", "_manifest.json"))
    summary2 = run_rollup_job(synth_dir, out, cfg)
    assert summary2["partitions_written"] == [victim]
    assert set(summary2["partitions_completed_previously"]) == parts - {victim}
    assert read_rollup_output(out).count() == total_rows

    # fully-complete job: nothing to do
    summary3 = run_rollup_job(synth_dir, out, cfg)
    assert summary3["partitions_written"] == []


def test_turns_passthrough_invariants(ray_session, synth_dir):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.turns import clean_turns

    ds = rd.read_parquet(synth_dir)
    out = clean_turns(ds, num_partitions=5).to_pandas()
    src = synth_transcripts_table(**CFG).to_pandas()

    assert len(out) == len(src)
    out_s = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src_s = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # byte-exact text and identical multiset of turns
    for col in ("conv_id", "turn_idx", "role", "text", "tool"):
        assert (out_s[col].values == src_s[col].values).all(), col
    assert (out_s["ts"].values == src_s["ts"].values).all()
    # stable order within each partition group: turn_idx ascending per conv
    grp = out.groupby("conv_id")["turn_idx"]
    assert (grp.apply(lambda s: (np.diff(s.values) > 0).all())).all()


def test_turns_dedup_idempotent_reingest(ray_session, synth_dir):
    # re-ingesting the same shard twice collapses to the original table
    import ray.data as rd

    from light_curve_feature_ray.pipelines.turns import clean_turns

    ds = rd.read_parquet(synth_dir)
    both = ds.union(rd.read_parquet(synth_dir))
    out = clean_turns(both, num_partitions=5).to_pandas()
    src = synth_transcripts_table(**CFG).to_pandas()
    assert len(out) == len(src)
    out_s = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src_s = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (out_s["text"].values == src_s["text"].values).all()


def test_turns_conflicting_duplicates_deterministic(ray_session, tmp_path):
    """Duplicate (conv_id, turn_idx) rows with DIFFERENT payloads must
    settle by the deterministic (min ts, then smallest text) rule, not by
    block arrival order — identical output for opposite block layouts."""
    import pyarrow.parquet as pq

    from light_curve_feature_ray.pipelines.turns import clean_turns
    from light_curve_feature_ray.sources.synth import synth_transcripts_table

    tbl = synth_transcripts_table(n_convs=6, mean_turns=30, hot_convs=0, seed=17)
    dup = tbl.slice(5, 12)
    # same keys and ts, lexicographically LARGER text -> must always lose
    dup = dup.set_column(
        dup.schema.get_field_index("text"), "text",
        pa.array(["zzz-conflict"] * dup.num_rows),
    )
    for name, parts in (("ab", [tbl, dup]), ("ba", [dup, tbl])):
        d = tmp_path / name
        d.mkdir()
        for i, p in enumerate(parts):
            pq.write_table(p, str(d / f"part-{i}.parquet"))

    def run(name):
        return (
            clean_turns(rd.read_parquet(str(tmp_path / name)), num_partitions=5)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    a, b = run("ab"), run("ba")
    pd.testing.assert_frame_equal(a, b)
    assert not (a["text"] == "zzz-conflict").any()


def test_jsonl_source_matches_parquet(ray_session, tmp_path):
    """read_transcripts_jsonl normalizes epoch-seconds JSONL to the
    canonical schema; the rollup over it equals the parquet-path rollup."""
    import json as _json
    from datetime import timezone

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from light_curve_feature_ray.pipelines.rollup import rollup_dataset, rollup_table
    from light_curve_feature_ray.sources.jsonl import read_transcripts_jsonl
    from light_curve_feature_ray.sources.synth import synth_transcripts_table
    from light_curve_feature_ray.stages.rollup import RollupConfig

    tbl = synth_transcripts_table(n_convs=20, seed=9)
    jl = tmp_path / "turns.jsonl"
    with open(jl, "w") as f:
        for row in tbl.to_pylist():
            # epoch SECONDS float; pin UTC — naive .timestamp() would
            # shift by the local UTC offset under e.g. TZ=America/New_York
            row["ts"] = row["ts"].replace(tzinfo=timezone.utc).timestamp()
            row["extra_key"] = "ignored"      # extra keys are dropped
            f.write(_json.dumps(row) + "\n")

    cfg = RollupConfig(
        features=("observation_count", "mean", "amplitude"),
        tiers=("1h",), gap_fill="none", hot_threshold=None,
        store_points=False, num_partitions=8,
    )
    expect = (
        pa.Table.to_pandas(rollup_table(tbl, cfg))
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    ds = read_transcripts_jsonl(str(jl))
    got = (
        rollup_dataset(ds, cfg)
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got[expect.columns], expect)


def test_jsonl_ts_rounds_and_keeps_nulls():
    """Float epoch-seconds must ROUND to microseconds (truncation shifts
    ~1.5% of values by 1us) and null ts stays null, not INT64_MIN."""
    import numpy as np
    import pyarrow as pa

    from light_curve_feature_ray.sources.jsonl import _normalize

    us = np.arange(123_456_780, 123_458_780, dtype=np.int64)
    tbl = pa.table(
        {
            "conv_id": pa.array(["c"] * len(us)),
            "turn_idx": pa.array(np.arange(len(us), dtype=np.int32)),
            "text": pa.array(["t"] * len(us)),
            "ts": pa.array(us / 1e6),  # epoch seconds, float
        }
    )
    out = _normalize(tbl, for_rollup=True)
    got = out["ts"].cast(pa.int64()).to_numpy()
    np.testing.assert_array_equal(got, us)

    tbl2 = pa.table(
        {
            "conv_id": pa.array(["c", "c"]),
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "text": pa.array(["a", "b"]),
            "ts": pa.array([1.5, None]),
        }
    )
    out2 = _normalize(tbl2, for_rollup=True)
    assert out2["ts"].null_count == 1
    assert out2["ts"].cast(pa.int64()).to_pylist() == [1_500_000, None]


def test_csv_source_matches_parquet(ray_session, tmp_path):
    """read_transcripts_csv funnels through the same normalization as the
    JSONL source; the rollup over a CSV dump equals the in-memory path."""
    import csv as _csv
    from datetime import timezone

    import pandas as pd
    import pyarrow as pa

    from light_curve_feature_ray.pipelines.rollup import (
        rollup_dataset,
        rollup_table,
    )
    from light_curve_feature_ray.sources.csv_src import read_transcripts_csv
    from light_curve_feature_ray.sources.synth import synth_transcripts_table
    from light_curve_feature_ray.stages.rollup import RollupConfig

    tbl = synth_transcripts_table(n_convs=15, seed=31)
    path = tmp_path / "turns.csv"
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["conv_id", "turn_idx", "role", "text", "tool", "ts",
                    "extra"])
        for row in tbl.to_pylist():
            w.writerow(
                [
                    row["conv_id"], row["turn_idx"], row["role"],
                    row["text"], row["tool"] or "",
                    # ISO-8601 string ts exercises the string branch
                    row["ts"].replace(tzinfo=timezone.utc).isoformat(),
                    "dropped",
                ]
            )

    cfg = RollupConfig(
        features=("observation_count", "mean", "amplitude"),
        tiers=("1h",), gap_fill="none", hot_threshold=None,
        store_points=False, num_partitions=8,
    )
    expect = (
        pa.Table.to_pandas(rollup_table(tbl, cfg))
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    got = (
        rollup_dataset(read_transcripts_csv(str(path)), cfg)
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[expect.columns], expect)
