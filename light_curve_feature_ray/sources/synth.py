"""Deterministic synthetic transcript table generator.

Produces the engine's input schema (BASELINE.json input_hint):

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us]

Shape (FIXTURES.md §A): log-normal turns/conv with a configurable set of
"hot" conversations (>=100x the median) for salting tests; regular or
irregular cadence; fixed seed => bit-identical tables across runs.
Everything is vectorized numpy; text payloads are deterministic slices of a
fixed alphabet so per-turn byte equality is checkable end-to-end.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["", "search", "python", "browser", "calculator"])
_CORPUS = (
    "the quick brown fox jumps over the lazy dog while answering questions "
    "about distributed time series rollups and lomb scargle periodograms "
    "0123456789 abcdefghijklmnopqrstuvwxyz "
) * 8
_EPOCH0 = 1_700_000_000  # 2023-11-14T22:13:20Z, seconds


def synth_transcripts_table(
    n_convs: int = 200,
    mean_turns: float = 30.0,
    hot_convs: int = 2,
    hot_turns: int = 4000,
    seed: int = 42,
    cadence: str = "irregular",  # or "regular"
    mean_dt_seconds: float = 45.0,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    sizes = np.maximum(
        1, rng.lognormal(np.log(mean_turns), 0.8, n_convs).astype(np.int64)
    )
    if hot_convs:
        sizes[:hot_convs] = hot_turns
    total = int(sizes.sum())
    conv_idx = np.repeat(np.arange(n_convs), sizes)
    starts = np.r_[0, np.cumsum(sizes)[:-1]]
    turn_idx = (np.arange(total) - starts[conv_idx]).astype(np.int32)

    if cadence == "regular":
        dts = np.full(total, mean_dt_seconds)
    else:
        dts = rng.exponential(mean_dt_seconds, total)
        # occasional long gaps to exercise gap-fill
        gap_mask = rng.random(total) < 0.01
        dts[gap_mask] += rng.exponential(30 * 60.0, int(gap_mask.sum()))
    # per-conv start offset spread over ~30 days
    conv_start = rng.uniform(0, 30 * 86400.0, n_convs)
    cum = np.cumsum(dts)
    base = cum - cum[starts][conv_idx] if total else cum
    t_seconds = _EPOCH0 + conv_start[conv_idx] + base
    ts_us = np.round(t_seconds * 1e6).astype(np.int64)

    role = _ROLES[turn_idx % 3]
    tool_choice = rng.integers(0, len(_TOOLS), total)
    tool = np.where(role == "tool", _TOOLS[tool_choice], "")

    lengths = np.maximum(1, rng.lognormal(4.0, 1.0, total).astype(np.int64))
    lengths = np.minimum(lengths, len(_CORPUS) - 1)
    offsets = rng.integers(0, len(_CORPUS) // 2, total)
    text = [
        _CORPUS[o : o + l] for o, l in zip(offsets.tolist(), lengths.tolist())
    ]

    return pa.table(
        {
            "conv_id": pa.array(
                np.char.add("conv_", conv_idx.astype(str)), type=pa.string()
            ),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
        }
    )


def synth_transcripts_parquet(
    path: str,
    shards: int = 1,
    **kwargs,
) -> str:
    """Write the synthetic table to ``path`` (a directory of shard files);
    returns the directory. Skips generation when the directory already has
    the expected shard count (cheap caching for benchmarks)."""
    os.makedirs(path, exist_ok=True)
    existing = [f for f in os.listdir(path) if f.endswith(".parquet")]
    if len(existing) == shards:
        return path
    table = synth_transcripts_table(**kwargs)
    n = table.num_rows
    # shard by conv-preserving row ranges (convs are contiguous)
    bounds = np.linspace(0, n, shards + 1).astype(np.int64)
    for i in range(shards):
        pq.write_table(
            table.slice(bounds[i], bounds[i + 1] - bounds[i]),
            os.path.join(path, f"part-{i:05d}.parquet"),
        )
    return path
