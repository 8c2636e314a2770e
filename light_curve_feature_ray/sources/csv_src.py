"""CSV transcript source — the reference crate's own dev-data interchange
format (its test fixtures load light curves from CSV via
``test-util/src/lc_data/csv_parser.rs``); here it is a first-class source
next to Parquet and JSONL.

A thin wrapper over ``ray.data.read_csv`` that funnels through the SAME
normalization as the JSONL source (``sources/jsonl._normalize``): canonical
schema ``conv_id:string, turn_idx:int32, role, text, tool, ts:timestamp[us]``,
with ``ts`` accepted as epoch seconds, epoch microseconds, ISO-8601 strings,
or a parsed timestamp.  Extra columns are dropped; a missing ``tool`` column
becomes nulls.  CSV carries no projection at the codec level, so pruning
happens immediately after the read, before anything enters the pipeline.
"""

from __future__ import annotations


def read_transcripts_csv(path, for_rollup: bool = True, **read_kwargs):
    """Dataset of canonical transcript rows from CSV file(s)/dir."""
    import ray.data as rd

    from .jsonl import _normalize

    ds = rd.read_csv(path, **read_kwargs)
    return ds.map_batches(
        lambda b: _normalize(b, for_rollup),
        batch_format="pyarrow",
        batch_size=None,
    )
