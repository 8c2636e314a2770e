"""Actor-based streaming hash exchange for the rollup — an EXPERIMENTAL
alternative to the Dataset sort-based ``groupby("part").map_groups``
shuffle (pipelines/rollup.py), attacking the measured AllToAll barrier:
with the sort exchange, no reduce work starts until every map block is
sorted, sampled and merged; here each packed map block is hash-ROUTED
(no sort, no boundary sampling) to one of R long-lived reducer actors
WHILE the map wave is still running, so reducer-side ingestion
(deserialize + buffer) overlaps derive/pack, and only the per-part
feature kernel remains post-barrier (it is inherently barriered: every
conv must be complete before holistic features evaluate — see the
round-5 dead-end entries in BASELINE.md).

This is the documented "drop to raw Ray actors where the Dataset API
can't express the semantics" case: Ray Data's AllToAll cannot overlap
map and reduce for heavyweight ``map_groups`` kernels (its streaming
HASH_SHUFFLE aggregators starve on them — round-4 dead-end entry).

Determinism: routing is ``part % R`` over the SAME part ids DeriveAssign
assigns, and each part's rows are re-assembled completely inside one
actor before the unchanged :class:`RollupWorker` runs per part — dedup,
ordering and salting semantics are untouched, so output is bit-identical
to the sort-exchange path (asserted by tests/test_streaming_exchange.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .rollup import RollupConfig, RollupWorker, unpack_packed


@ray.remote(num_cpus=0)
class _PartReducer:
    """Owns the parts with ``part % num_reducers == idx``: buffers the
    routed slices as they stream in, then runs the unchanged worker per
    part at finalize. Suite/FFT state is built once per actor."""

    def __init__(self, config_dict: dict, hot_list=None):
        self.worker = RollupWorker(
            RollupConfig.from_dict(config_dict), hot_list=hot_list
        )
        self.buf: list[pa.Table] = []

    def add(self, t: pa.Table) -> int:
        # ingestion only — cheap, overlaps the map wave
        if t.num_rows:
            self.buf.append(t)
        return t.num_rows

    def finalize(self) -> pa.Table:
        if not self.buf:
            return self.worker._empty()
        merged = pa.concat_tables(self.buf, promote_options="default")
        self.buf = []
        part = merged["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        merged = merged.take(pa.array(order))
        part = part[order]
        starts = np.flatnonzero(np.r_[True, part[1:] != part[:-1]])
        ends = np.r_[starts[1:], part.shape[0]]
        outs = []
        for s, e in zip(starts, ends):
            # one partition group at a time — salting depends on parts
            # staying separate (gap-fill truncates at salt windows)
            outs.append(
                self.worker(
                    unpack_packed(merged.slice(s, e - s).drop_columns(["part"]))
                )
            )
        return pa.concat_tables(outs) if outs else self.worker._empty()


@ray.remote
def _route(block: pa.Table, reducers: list) -> int:
    """Split one packed map block by ``part % R`` and push each slice to
    its reducer — runs as a task, so routing parallelizes with the map
    wave and data never touches the driver."""
    # a 0-row input can surface as an empty block carrying the INPUT
    # schema (Ray may skip the map fn on empty blocks) — nothing to route
    if block.num_rows == 0 or "part" not in block.column_names:
        return 0
    n_red = len(reducers)
    part = block["part"].to_numpy(zero_copy_only=False).astype(np.int64)
    dest = part % n_red
    waits = []
    for r in range(n_red):
        mask = dest == r
        if mask.any():
            waits.append(reducers[r].add.remote(block.filter(pa.array(mask))))
    ray.get(waits)  # backpressure: the route task holds until ingested
    return block.num_rows


def rollup_streaming_exchange(
    packed_ds,
    config: RollupConfig,
    *,
    num_reducers: int | None = None,
    hot_list=None,
):
    """Run the rollup reduce over ``packed_ds`` (the output of
    derive+pack, with a ``part`` column) through the streaming actor
    exchange. Returns the concatenated tier-row :class:`pa.Table` refs
    as a ``ray.data.Dataset``.

    ``config.num_partitions`` must already be resolved (the part ids in
    ``packed_ds`` were assigned with it)."""
    import ray.data as rd

    if num_reducers is None:
        num_reducers = max(2, int(ray.cluster_resources().get("CPU", 8)))
    reducers = [
        _PartReducer.remote(config.to_dict(), hot_list)
        for _ in range(num_reducers)
    ]
    # stream map-output blocks into route tasks AS THEY MATERIALIZE —
    # this is the overlap the AllToAll barrier forbids
    route_refs = []
    for bundle in packed_ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            route_refs.append(_route.remote(block_ref, reducers))
    ray.get(route_refs)  # map + routing complete
    out_refs = [r.finalize.remote() for r in reducers]
    return rd.from_arrow_refs(out_refs)
