"""Resumable job execution: per-partition parquet output + lineage manifests.

Output layout (resumable-output contract; no reference counterpart —
engine-side design):

    out_dir/
      _job.json                     # config + input lineage of the job
      part=<p>/
        data.parquet                # tier rows of partition p
        _manifest.json              # completion marker with metrics

A partition directory is written atomically (temp file + rename); the
manifest is written last, so a partition is complete iff its manifest
exists. On resume, completed partitions are skipped — the derive stage
filters their rows out before the shuffle, so a rerun only pays for the
missing partitions. Every stage is deterministic (fixed hashes, no RNG), so
retries and resumes produce identical bytes.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..stages.rollup import RollupConfig, RollupWorker, detect_hot_convs


def _manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}", "_manifest.json")


def completed_partitions(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part="):
            p = int(name.split("=", 1)[1])
            if os.path.exists(_manifest_path(out_dir, p)):
                done.add(p)
    return done


def _write_partition(
    table: pa.Table, out_dir: str, part: int, lineage: dict[str, Any]
) -> dict[str, Any]:
    part_dir = os.path.join(out_dir, f"part={part}")
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, ".data.parquet.tmp")
    pq.write_table(table, tmp)
    final = os.path.join(part_dir, "data.parquet")
    os.replace(tmp, final)
    tier_counts = (
        pc.value_counts(table["tier"]).to_pylist() if table.num_rows else []
    )
    manifest = {
        "partition": part,
        "rows": table.num_rows,
        "bytes": os.path.getsize(final),
        "tiers": {d["values"]: d["counts"] for d in tier_counts},
        "written_at": time.time(),
        "lineage": lineage,
    }
    tmp_m = _manifest_path(out_dir, part) + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, _manifest_path(out_dir, part))
    return manifest


class CheckpointedRollupWorker:
    """map_groups callable: rollup one partition, write it, emit the
    manifest row (the Dataset output is the tiny manifest table)."""

    def __init__(
        self,
        config: RollupConfig,
        out_dir: str,
        lineage: dict,
        hot_list=None,
        packed: bool = False,
    ):
        # hot_list must match DeriveAssign's so salted gap-fill truncates
        # at salt-window boundaries (partition-count independence)
        self.worker = RollupWorker(config, hot_list=hot_list)
        self.out_dir = out_dir
        self.lineage = lineage
        self.packed = packed

    def __call__(self, batch: pa.Table) -> pa.Table:
        part = int(batch["part"][0].as_py()) if batch.num_rows else -1
        if self.packed:
            from ..stages.rollup import unpack_packed

            batch = unpack_packed(batch)
        table = self.worker(batch)
        manifest = _write_partition(table, self.out_dir, part, self.lineage)
        return pa.table(
            {
                "partition": pa.array([part], type=pa.int32()),
                "rows": pa.array([manifest["rows"]], type=pa.int64()),
                "bytes": pa.array([manifest["bytes"]], type=pa.int64()),
            }
        )


def run_rollup_job(
    input_path: str,
    out_dir: str,
    config: RollupConfig | None = None,
) -> dict[str, Any]:
    """Run (or resume) the rollup over transcript parquet at ``input_path``,
    writing per-partition tier parquet + manifests under ``out_dir``.
    Returns a job summary dict. This is the ``ray job submit`` entrypoint
    body (see scripts/rollup_job.py)."""
    from ..pipelines.rollup import _derive_fn, read_transcripts

    config = config or RollupConfig()
    ds = read_transcripts(input_path)
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    job_path = os.path.join(out_dir, "_job.json")
    prior = None
    if os.path.exists(job_path):
        with open(job_path) as f:
            prior = json.load(f)
    if config.num_partitions is None:
        if prior is not None and prior.get("input") == input_path:
            # a RESUME must reuse the original partition modulus: the auto
            # rule depends on cluster size, and mixing two moduli across
            # one output directory silently drops/duplicates conversations
            from dataclasses import replace

            config = replace(
                config,
                num_partitions=int(prior["config"]["num_partitions"]),
            )
        else:
            config = config.resolved(ds.count())
    if done and prior is not None and (
        prior.get("input") != input_path or prior.get("config") != config.to_dict()
    ):
        raise ValueError(
            "refusing to resume: existing _job.json lineage in "
            f"{out_dir!r} records a different input or config than this "
            "run; use a fresh out_dir or pass the original config"
        )
    hot_ref, hot = None, None
    if config.hot_threshold is not None:
        hot = detect_hot_convs(ds, config.hot_threshold)
        if hot:
            hot_ref = ray.put(hot)
    # the hot set is part of the partition-assignment identity — the
    # incremental update job (pipelines/update.py) must replay it
    lineage = {
        "input": input_path,
        "config": config.to_dict(),
        "hot": sorted(hot) if hot else [],
    }
    with open(job_path, "w") as f:
        json.dump(lineage, f)
    from ..stages.rollup import pack_derived

    derived = ds.map_batches(
        _derive_fn(config, hot_ref),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    ).map_batches(
        # same packed exchange as rollup_dataset: the shuffle moves one
        # list-packed row per (block, part, conv-run); bit-identical
        pack_derived,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    if done:
        done_arr = list(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch["part"], value_set=pa.array(done_arr)))
            )

        derived = derived.map_batches(drop_done, batch_format="pyarrow")

    worker = CheckpointedRollupWorker(
        config, out_dir, lineage, hot_list=hot, packed=True
    )

    def checkpointed_rollup(batch: pa.Table) -> pa.Table:
        return worker(batch)

    manifests = derived.groupby("part").map_groups(
        checkpointed_rollup, batch_format="pyarrow"
    )
    new_parts = manifests.to_pandas()
    return {
        "partitions_completed_previously": sorted(done),
        "partitions_written": sorted(new_parts["partition"].tolist())
        if len(new_parts)
        else [],
        "rows_written": int(new_parts["rows"].sum()) if len(new_parts) else 0,
    }


def read_rollup_output(out_dir: str):
    """Dataset over all completed partitions' tier rows."""
    import ray.data as rd

    paths = [
        os.path.join(out_dir, f"part={p}", "data.parquet")
        for p in sorted(completed_partitions(out_dir))
    ]
    ds = rd.read_parquet(paths)
    # the hive-style part=<p> directory names make the reader infer a
    # "part" column that isn't in the written files -- drop it
    if "part" in ds.schema().names:
        ds = ds.drop_columns(["part"])
    return ds


def write_dataset_partitioned(
    ds,
    out_dir: str,
    *,
    key_col: str,
    num_partitions: int = 64,
    lineage: dict | None = None,
):
    """Generic resumable partitioned-parquet sink for ANY Dataset — the
    rollup job's checkpoint contract (one ``part=<p>/`` directory per
    hash partition, atomic data.parquet + ``_manifest.json`` written
    LAST, so a partition is complete iff its manifest exists) applied
    to arbitrary pipelines: dedup decision tables, curation outputs,
    resampled series. On rerun over the same ``out_dir``, completed
    partitions are SKIPPED — their bytes are never rewritten — and only
    the missing ones recompute, which is what makes a 100-TB write
    restartable after a mid-job failure. Partition assignment hashes
    ``key_col`` with the engine's fixed deterministic hash, so the
    row→partition map is identical across retries and cluster sizes
    (same rule as the rollup; ``num_partitions`` is part of the output
    identity and is recorded in every manifest).

    Returns a summary dict: partitions written / skipped, rows, bytes.

    Scale shape: ONE key-hash exchange; each reduce task writes its own
    partition directory and emits a one-row manifest summary — no
    driver bottleneck, no single giant file.
    """
    import numpy as np

    from ..stages.rollup import hash_strings

    done = completed_partitions(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    base_lineage = dict(lineage or {})
    base_lineage.setdefault("key_col", key_col)
    base_lineage.setdefault("num_partitions", num_partitions)

    def assign(batch: pa.Table) -> pa.Table:
        key = batch[key_col]
        if not pa.types.is_string(key.type):
            key = pc.cast(key, pa.string())
        part = (
            hash_strings(key) % np.uint64(num_partitions)
        ).astype(np.int32)
        return batch.append_column(
            "part", pa.array(part, type=pa.int32())
        )

    def write_part(grp: pa.Table) -> pa.Table:
        part = int(grp["part"][0].as_py())
        grp = grp.drop_columns(["part"])
        if part in done:
            return pa.table(
                {
                    "partition": pa.array([part], type=pa.int32()),
                    "rows": pa.array([0], type=pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        part_dir = os.path.join(out_dir, f"part={part}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, ".data.parquet.tmp")
        pq.write_table(grp, tmp)
        final = os.path.join(part_dir, "data.parquet")
        os.replace(tmp, final)
        manifest = {
            "partition": part,
            "rows": grp.num_rows,
            "bytes": os.path.getsize(final),
            "written_at": time.time(),
            "lineage": base_lineage,
        }
        tmp_m = _manifest_path(out_dir, part) + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_m, _manifest_path(out_dir, part))
        return pa.table(
            {
                "partition": pa.array([part], type=pa.int32()),
                "rows": pa.array([grp.num_rows], type=pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    results = (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "out_dir": out_dir,
        "partitions_written": int((~results["skipped"]).sum()),
        "partitions_skipped": int(results["skipped"].sum()),
        "rows_written": int(results["rows"].sum()),
    }


def read_dataset_partitioned(out_dir: str):
    """Read back a :func:`write_dataset_partitioned` output as one
    Dataset (only completed partitions — a torn partition without its
    manifest is invisible, the resume contract)."""
    import ray.data as rd

    paths = [
        os.path.join(out_dir, f"part={p}", "data.parquet")
        for p in sorted(completed_partitions(out_dir))
    ]
    ds = rd.read_parquet(paths)
    # the hive-style part=<p> directory names make the reader infer a
    # "part" column that isn't in the written files -- drop it
    if "part" in ds.schema().names:
        ds = ds.drop_columns(["part"])
    return ds
