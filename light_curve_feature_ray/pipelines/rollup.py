"""End-to-end rollup pipelines over ray.data Datasets.

``rollup_dataset`` is the pure transformation (Dataset in, tier-row Dataset
out, streaming, one shuffle); ``run_rollup_job`` (state/checkpoint.py) adds
resumable per-partition parquet output with lineage manifests.
"""

from __future__ import annotations

import json
from typing import Sequence

import pyarrow as pa

import ray
import ray.data as rd

from ..stages.rollup import (
    DeriveAssign,
    RollupConfig,
    RollupWorker,
    detect_hot_convs,
    pack_derived,
    unpack_packed,
)

INPUT_COLUMNS = ["conv_id", "turn_idx", "text", "ts"]

# per-worker-process caches: state survives across tasks in the same Ray
# worker process, amortizing suite construction / FFT scratch exactly like
# an actor would (actor-pool execution is available via worker_concurrency)
_WORKER_CACHE: dict = {}
_HOT_CACHE: dict = {}


def read_transcripts(
    path: str | Sequence[str],
    for_rollup: bool = True,
    num_blocks: int | None = None,
):
    """Prune at the read: the rollup needs only 4 of the 6 input columns.

    ``num_blocks`` caps the block count — Ray otherwise targets ~200 blocks,
    and shuffle scheduling cost scales with blocks x reduce partitions;
    a few blocks per CPU is the sweet spot for this pipeline."""
    columns = INPUT_COLUMNS if for_rollup else None
    kwargs = {}
    if num_blocks is not None:
        kwargs["override_num_blocks"] = num_blocks
    return rd.read_parquet(path, columns=columns, **kwargs)


def _derive_fn(config: RollupConfig, hot_ref):
    def fn(batch: pa.Table) -> pa.Table:
        if hot_ref is None:
            hot = None
        else:
            key = hot_ref.hex()
            if key not in _HOT_CACHE:
                _HOT_CACHE[key] = ray.get(hot_ref)
            hot = _HOT_CACHE[key]
        return DeriveAssign(config, hot_list=hot)(batch)

    return fn


def _worker_fn(config: RollupConfig, hot_ref=None, packed: bool = False):
    cfg_key = json.dumps(config.to_dict(), sort_keys=True)
    if hot_ref is not None:
        cfg_key += ":" + hot_ref.hex()

    def fn(batch: pa.Table) -> pa.Table:
        worker = _WORKER_CACHE.get(cfg_key)
        if worker is None:
            hot = None
            if hot_ref is not None:
                key = hot_ref.hex()
                if key not in _HOT_CACHE:
                    _HOT_CACHE[key] = ray.get(hot_ref)
                hot = _HOT_CACHE[key]
            worker = RollupWorker(config, hot_list=hot)
            _WORKER_CACHE[cfg_key] = worker
        if packed:
            batch = unpack_packed(batch)
        return worker(batch)

    return fn


class _PackedRollupWorker(RollupWorker):
    """Actor-pool variant of :class:`RollupWorker` for the packed
    exchange: unpack the list-packed partition group, then the unchanged
    worker."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        return super().__call__(unpack_packed(batch))


def rollup_dataset(
    ds,
    config: RollupConfig | None = None,
    *,
    worker_concurrency: int | tuple | None = None,
    hot_detect_ds=None,
    hot_list=None,
    packed_exchange: bool = True,
):
    """Build the streaming rollup pipeline (lazy Dataset of tier rows).

    One hash shuffle total: ``groupby("part")``. With
    ``worker_concurrency`` set, the rollup worker runs as an actor pool
    (per-actor suite state built once in ``__init__``); by default it runs
    as tasks whose per-worker-process module cache provides the same state
    amortization.

    ``packed_exchange`` (default True) inserts the :func:`pack_derived`
    combiner before the groupby: the exchange then moves one list-packed
    row per (block, part, conv-run) instead of one row per turn,
    attacking the row-count-proportional part of the sort barrier
    (measured same-session: 8-cpu leg 1.16-1.27x faster, 2->8 efficiency
    +0.12-0.15, 2-cpu leg neutral with the zero-copy run packing; see
    BASELINE.md round 4). Output is bit-identical (the worker unpacks,
    then sorts/dedups as usual — tests/test_parallelism_invariance.py).
    """
    config = config or RollupConfig()
    # auto partition count resolves BEFORE any worker state keys on
    # config.to_dict(). ds.count() is metadata-only for a fresh parquet
    # read; for an already-transformed dataset it executes the upstream
    # lineage once just to count — pass an explicit num_partitions (or a
    # pre-materialized dataset) in that case.
    config = config.resolved(ds.count()) if config.num_partitions is None else config
    hot_ref = None
    if hot_list is not None:
        # precomputed hot-conversation set (a slowly-changing property of
        # the data distribution; production jobs refresh it periodically
        # rather than per run)
        if hot_list:
            hot_ref = ray.put(list(hot_list))
    elif config.hot_threshold is not None:
        # hot_detect_ds lets callers pass a conv_id-only read so the
        # detection pre-pass doesn't re-decode the text column
        hot = detect_hot_convs(hot_detect_ds or ds, config.hot_threshold)
        if hot:
            hot_ref = ray.put(hot)
    derived = ds.map_batches(
        _derive_fn(config, hot_ref),
        batch_format="pyarrow",
        batch_size=None,  # whole blocks; the default 1024-row batches add
        zero_copy_batch=True,  # ~100x task overhead on wide scans
    )
    if packed_exchange:
        derived = derived.map_batches(
            pack_derived,
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
    grouped = derived.groupby("part")
    if worker_concurrency is not None:
        hot_items = ray.get(hot_ref) if hot_ref is not None else None
        return grouped.map_groups(
            _PackedRollupWorker if packed_exchange else RollupWorker,
            fn_constructor_args=(config,),
            fn_constructor_kwargs={"hot_list": hot_items},
            batch_format="pyarrow",
            concurrency=worker_concurrency,
        )
    return grouped.map_groups(
        _worker_fn(config, hot_ref, packed=packed_exchange),
        batch_format="pyarrow",
    )


def rollup_dataset_streaming(
    ds,
    config: RollupConfig | None = None,
    *,
    num_reducers: int | None = None,
    hot_list=None,
):
    """EXPERIMENTAL: the rollup over the actor-based streaming hash
    exchange (stages/streaming_exchange.py) instead of the Dataset sort
    shuffle — reducer ingestion overlaps the map wave; see the module
    doc for the semantics/determinism argument and BASELINE.md for the
    measured A/B vs :func:`rollup_dataset`. Output is bit-identical.

    Hot-conv detection pre-pass is NOT run here (pass ``hot_list``
    explicitly); production path remains :func:`rollup_dataset`."""
    from ..stages.streaming_exchange import rollup_streaming_exchange

    config = config or RollupConfig()
    config = (
        config.resolved(ds.count())
        if config.num_partitions is None
        else config
    )
    hot_ref = ray.put(list(hot_list)) if hot_list else None
    packed = ds.map_batches(
        _derive_fn(config, hot_ref),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    ).map_batches(
        pack_derived,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    return rollup_streaming_exchange(
        packed,
        config,
        num_reducers=num_reducers,
        hot_list=list(hot_list) if hot_list else None,
    )


def rollup_table(table: pa.Table, config: RollupConfig | None = None) -> pa.Table:
    """In-process reference path (no Ray): derive + single-partition worker.

    Used by tests as the naive oracle and by tiny inputs; produces the same
    rows as ``rollup_dataset`` modulo row order.
    """
    config = (config or RollupConfig()).resolved(table.num_rows, num_cpus=1)
    derived = DeriveAssign(config)(table)
    return RollupWorker(config)(derived)


#: per-tier TTL in seconds; None = keep forever. The retention half of the
#: "rollup + downsample + retention" contract: fine tiers age out first,
#: coarse tiers persist (classic continuous-aggregate retention policy).
DEFAULT_RETENTION = {"1m": 7 * 86400, "1h": 90 * 86400, "1d": None}


def apply_retention(tiers_ds, now_us: int, policy: dict | None = None):
    """Filter tier rows by per-tier TTL: keep a row iff its tier's policy
    is None or ``bucket_ts >= now - ttl``. A stateless vectorized
    ``map_batches`` filter — at scale this prunes entire partitions when
    the tier parquet is partitioned by (tier, date), so retention is a
    metadata operation for expired partitions and a filter at the edge.
    ``now_us`` must be supplied by the caller (epoch microseconds) so the
    operation is deterministic and retry-safe."""
    policy = DEFAULT_RETENTION if policy is None else policy

    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import numpy as np
        import pyarrow.compute as pc

        bucket_us = batch["bucket_ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        tiers = batch["tier"].to_numpy(zero_copy_only=False)
        keep = np.ones(batch.num_rows, dtype=bool)
        for tier, ttl in policy.items():
            if ttl is None:
                continue
            cutoff = now_us - int(ttl) * 1_000_000
            keep &= (tiers != tier) | (bucket_us >= cutoff)
        return batch.filter(pa.array(keep))

    return tiers_ds.map_batches(f, batch_format="pyarrow", batch_size=None)
