"""JSONL transcript source — the common interchange format for transcript
dumps (one JSON object per line). A thin, pruning wrapper over
``ray.data.read_json`` that normalizes to the engine's canonical input
schema (BASELINE.json input_hint):

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us]

``ts`` accepts epoch seconds (int/float), epoch microseconds (int >=
~1e14), or ISO-8601 strings. Column pruning happens right after the read
(JSON has no column projection at the codec level — documents with extra
keys are fine, the projection drops them), so only the six canonical
columns enter the pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CANONICAL = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _normalize(batch: pa.Table, for_rollup: bool) -> pa.Table:
    cols = {}
    names = set(batch.column_names)
    want = ["conv_id", "turn_idx", "text", "ts"] if for_rollup else CANONICAL
    for name in want:
        if name == "ts":
            continue
        if name not in names:
            if name == "tool":
                cols["tool"] = pa.nulls(batch.num_rows, type=pa.string())
                continue
            raise ValueError(f"transcripts missing column {name!r}")
        col = batch[name]
        if name == "conv_id" or name == "role" or name == "text" or name == "tool":
            cols[name] = col.cast(pa.string())
        elif name == "turn_idx":
            cols[name] = col.cast(pa.int32())
    ts = batch["ts"]
    t = ts.type
    if pa.types.is_timestamp(t):
        cols["ts"] = ts.cast(pa.timestamp("us"))
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        cols["ts"] = ts.cast(pa.timestamp("us"))
    elif pa.types.is_integer(t) or pa.types.is_floating(t):
        v = pc.cast(ts, pa.float64()).to_numpy(zero_copy_only=False)
        # heuristic: values >= 1e14 are already microseconds, else seconds.
        # rint, not astype-truncation: v*1e6 can land just below the true
        # integer (123456789 -> 123456788.9999...) and truncation would
        # silently shift ~1.5% of timestamps by 1 us, breaking min-ts
        # duplicate settlement and t-min(t) parity. Nulls stay null
        # (NaN -> masked) instead of becoming INT64_MIN garbage.
        null_mask = np.isnan(v)
        us_f = np.where(np.abs(v) >= 1e14, v, v * 1e6)
        us = np.rint(np.where(null_mask, 0.0, us_f)).astype(np.int64)
        cols["ts"] = pa.array(us, mask=null_mask).cast(pa.timestamp("us"))
    else:
        raise ValueError(f"unsupported ts type {t}")
    order = [c for c in (want if "ts" in want else want + ["ts"]) if c in cols or c == "ts"]
    return pa.table({c: cols[c] for c in order})


def read_transcripts_jsonl(path, for_rollup: bool = True, **read_kwargs):
    """Dataset of canonical transcript rows from JSONL file(s)/dir."""
    import ray.data as rd

    ds = rd.read_json(path, **read_kwargs)
    return ds.map_batches(
        lambda b: _normalize(b, for_rollup),
        batch_format="pyarrow",
        batch_size=None,
    )
