"""Turn-level pipelines: idempotent re-ingest dedup + ordered passthrough.

The per-row invariant (BASELINE.json input_hint): per-turn ``text`` byte
equality under stable turn ordering must survive the engine. ``text`` never
passes through any float path — this pipeline carries the raw columns
untouched, deduplicates (conv_id, turn_idx) first-wins, and orders turns
within each conversation by turn_idx. One hash shuffle (same partitioner as
the rollup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.rollup import hash_strings


def _dedup_sort_partition(batch: pa.Table) -> pa.Table:
    conv_dict = batch["conv_id"].combine_chunks().dictionary_encode()
    codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((turn, codes))
    keep = np.ones(order.shape[0], dtype=bool)
    c, t = codes[order], turn[order]
    keep[1:] = (c[1:] != c[:-1]) | (t[1:] != t[:-1])
    taken = batch.take(pa.array(order[keep]))
    return taken.drop_columns(["part"]) if "part" in batch.column_names else taken


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    part = (
        hash_strings(batch["conv_id"]) % np.uint64(num_partitions)
    ).astype(np.int32)
    return batch.append_column("part", pa.array(part, type=pa.int32()))


def clean_turns(ds, num_partitions: int = 64):
    """Dedup (conv_id, turn_idx) first-wins; turns ordered by turn_idx
    within each conversation. All six input columns pass through untouched.

    A block-local pre-dedup runs before the shuffle (a combiner): re-ingest
    duplicates — the common case — are dropped before their bytes move
    through the exchange; the per-partition pass settles cross-block
    duplicates."""

    def local_then_part(b: pa.Table) -> pa.Table:
        return add_partition_column(_dedup_sort_partition(b), num_partitions)

    withpart = ds.map_batches(
        local_then_part,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    return withpart.groupby("part").map_groups(
        _dedup_sort_partition, batch_format="pyarrow"
    )
