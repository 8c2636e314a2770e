"""The rollup engine: derive → one hash shuffle → per-partition tier cascade.

Pipeline shape (SURVEY.md §3, §7):

1. ``derive``: stateless ``map_batches`` over zero-copy Arrow — project each
   turn to (conv_id, turn_idx, ts_us, m=len(text), w=1.0) and assign a
   partition id ``part = hash64(conv_id) % P``. Hot conversations (detected
   by a cheap pre-aggregated count pass and broadcast via ``ray.put``) are
   salted: their part key also mixes ``day // salt_window_days``, spreading
   a huge conversation across partitions by time range. Tier buckets are at
   most 1 day and salt ranges are whole days, so no bucket ever spans two
   salt ranges; gap-fill for hot convs is bounded to the salt window
   (documented skew/correctness trade-off).
2. ``groupby("part").map_groups``: THE single all-to-all exchange. Each
   partition is processed wholly inside one task by :class:`RollupWorker`:
   lexsort by (conv, turn_idx), first-wins dedup of (conv_id, turn_idx),
   then the tier cascade:

   - tier 1m: features over the raw points of each (conv, minute) bucket
     (vectorized across all buckets via features/grouped.py);
   - the 1m *bin series* (Bins semantics, reference
     /root/reference/src/features/bins.rs:171-201: t* = center, m* =
     weighted mean, w* = sum(w)/N) is gap-filled (prev/linear) and feeds
     tier 1h; the 1h bin series is gap-filled and feeds tier 1d.
   - per bucket, the points that fed the tier are stored Gorilla-compressed
     (codec/gorilla.py) in a binary column.

   The worker is an actor-pool callable class: per-actor state (the
   configured feature suite, incl. the periodogram FFT scratch cache) is
   built once in ``__init__``.

No other shuffle exists; the cascade is conv-local once partitioned.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codec import gorilla
from ..features.extractor import FeatureExtractor
from ..features.grouped import GroupedSuite

US_PER_MIN = 60_000_000

#: tier name -> (bucket width in minutes, source: "raw" | previous tier)
TIERS = {"1m": 1, "1h": 60, "1d": 1440}

DEFAULT_FEATURES: tuple = (
    "observation_count",
    "mean",
    "weighted_mean",
    "standard_deviation",
    "amplitude",
    "duration",
    "skew",
    "kurtosis",
    {"name": "beyond_n_std", "nstd": 1.0},
    "eta",
    "eta_e",
    "stetson_k",
    "linear_trend",
    "linear_fit",
    {"name": "periodogram", "peaks": 1},
)


@dataclass
class RollupConfig:
    features: tuple = DEFAULT_FEATURES
    tiers: tuple = ("1m", "1h", "1d")
    gap_fill: str = "linear"  # "none" | "prev" | "linear"
    fill_levels: tuple = ("1m", "1h")  # which bin series get gap-filled
    max_fill_gap: int = 2880  # max missing slots filled per gap (None = all)
    #: None = auto-size at pipeline entry (``auto_num_partitions``:
    #: a rows-per-partition target band instead of a fixed constant, so the
    #: one-partition-per-reduce-task memory bound holds at any input scale)
    num_partitions: int | None = None
    hot_threshold: int | None = 10_000  # turns; None disables salting
    salt_window_days: int = 1
    store_points: bool = True
    fill_value: float = float("nan")

    def extractor(self) -> FeatureExtractor:
        return FeatureExtractor.from_config(list(self.features))

    def resolved(self, n_rows: int, num_cpus: int | None = None) -> "RollupConfig":
        """Copy with ``num_partitions`` resolved by the auto rule if unset.
        The single place the resolution rule lives — it is part of the
        worker-cache and checkpoint-lineage identity."""
        if self.num_partitions is not None:
            return self
        from dataclasses import replace

        return replace(
            self,
            num_partitions=auto_num_partitions(n_rows, num_cpus=num_cpus),
        )

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RollupConfig":
        """Inverse of :meth:`to_dict` (checkpoint-lineage round-trip)."""
        d = dict(d)
        for k in ("features", "tiers", "fill_levels"):
            if k in d:
                d[k] = tuple(d[k])
        if d.get("fill_value") == "nan":
            d["fill_value"] = float("nan")
        return cls(**d)

    def to_dict(self) -> dict[str, Any]:
        # fill_value must be part of the identity: worker caches and
        # checkpoint lineage key on this dict (NaN isn't portable JSON,
        # so serialize it as a string token)
        fv = self.fill_value
        fv_ser = "nan" if isinstance(fv, float) and np.isnan(fv) else fv
        return {
            "features": list(self.features),
            "tiers": list(self.tiers),
            "gap_fill": self.gap_fill,
            "fill_levels": list(self.fill_levels),
            "max_fill_gap": self.max_fill_gap,
            "num_partitions": self.num_partitions,
            "hot_threshold": self.hot_threshold,
            "salt_window_days": self.salt_window_days,
            "store_points": self.store_points,
            "fill_value": fv_ser,
        }


def auto_num_partitions(
    n_rows: int,
    num_cpus: int | None = None,
    target_rows: int = 100_000,
    max_parts: int = 65_536,
) -> int:
    """Partition count from a rows-per-partition target band.

    ~``target_rows`` rows per reduce partition (one partition = one reduce
    task holding its partition in memory — the band keeps that bounded at
    any input size), floored at 2 tasks per CPU slot for wave smoothing and
    capped so tiny inputs don't shatter into empty partitions. 100k rows/
    partition reproduces the measured-optimal P=96 for the 9.5M-turn bench
    (BASELINE.md) while scaling linearly with the input."""
    if num_cpus is None:
        try:
            import ray

            num_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            num_cpus = 8
    by_rows = -(-int(n_rows) // target_rows) if n_rows > 0 else 1
    parts = max(by_rows, 2 * num_cpus)
    parts = min(parts, max(-(-int(n_rows) // 1_000), 1), max_parts)
    return max(parts, 1)


# ---------------------------------------------------------------------------
# hashing (deterministic across processes; vectorized)
# ---------------------------------------------------------------------------


def hash_strings(arr: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string column via polars
    (ahash with fixed seeds; stable across processes for a given polars
    version, which is all a single job needs)."""
    import polars as pl

    s = pl.from_arrow(arr)
    return s.hash(seed=seed).to_numpy().astype(np.uint64)


# ---------------------------------------------------------------------------
# derive + partition assignment stage
# ---------------------------------------------------------------------------


def assign_parts(
    conv: np.ndarray,
    h: np.ndarray,
    ts_us: np.ndarray,
    config: "RollupConfig",
    hot: set,
) -> np.ndarray:
    """Partition assignment shared by DeriveAssign and the incremental
    update path (pipelines/update.py): plain ``hash % P`` for normal
    conversations, day-window-salted mixing for hot ones — rows of a hot
    conv spread over partitions by time window, and the worker's
    salt-window-truncated gap-fill keeps results partition-invariant."""
    part = (h % np.uint64(config.num_partitions)).astype(np.int32)
    if hot:
        is_hot = np.isin(conv, list(hot))
        if is_hot.any():
            days = (ts_us // (86_400 * 1_000_000)).astype(np.uint64)
            salt = days // np.uint64(config.salt_window_days)
            mixed = (h ^ (salt * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(
                config.num_partitions
            )
            part = np.where(is_hot, mixed.astype(np.int32), part)
    return part


class DeriveAssign:
    """Stateless-per-batch map_batches callable: derive (t, m, w) and assign
    the (salted) partition key. The hot-conv list is broadcast once via
    ``ray.put`` and resolved per worker (pipelines/rollup.py)."""

    def __init__(self, config: RollupConfig, hot_list=None):
        self.config = config
        self.hot = set(hot_list) if hot_list else set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        ts_us = batch["ts"].cast(pa.int64())
        # null text counts as zero-length (deterministic total rule)
        m = pc.cast(
            pc.fill_null(pc.utf8_length(batch["text"]), 0), pa.float64()
        )
        h = hash_strings(batch["conv_id"])
        part = assign_parts(
            batch["conv_id"].to_numpy(zero_copy_only=False)
            if self.hot
            else np.empty(0),
            h,
            ts_us.to_numpy(zero_copy_only=False),
            cfg,
            self.hot,
        )
        return pa.table(
            {
                # dictionary-encoded: the conv_id strings dominate the
                # exchanged bytes; indices + per-block dictionaries cut the
                # shuffle payload ~30% (chunk dictionaries are unified by
                # combine_chunks on the reduce side)
                "conv_id": pc.dictionary_encode(
                    batch["conv_id"].combine_chunks()
                ),
                "turn_idx": batch["turn_idx"],
                "ts_us": ts_us,
                "m": m,
                "part": pa.array(part, type=pa.int32()),
            }
        )


def pack_derived(batch: pa.Table) -> pa.Table:
    """Exchange combiner: collapse this block's derived rows to ONE row
    per (part, conv) with the (turn_idx, ts_us, m) triples packed as
    Arrow list columns. The sort-based exchange's scale-independent cost
    (block sorts, boundary sampling, reduce-side merges) grows with ROW
    COUNT, not bytes — packing moves rows/(convs-per-block) times fewer
    rows through the barrier while the list values ride as one
    contiguous buffer per column (no per-run Python: one composite
    argsort + ListArray.from_arrays wraps). The reduce side unpacks with
    :func:`unpack_packed` before the unchanged worker — dedup and all
    ordering happen in the worker exactly as with the row exchange, so
    output (including retry/duplicate resolution) is bit-identical.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "part": pa.array([], type=pa.int32()),
                "conv_id": pa.array([], type=pa.string()),
                "ti": pa.array([], type=pa.list_(pa.int64())),
                "ts": pa.array([], type=pa.list_(pa.int64())),
                "m": pa.array([], type=pa.list_(pa.float64())),
            }
        )
    conv = batch["conv_id"].combine_chunks()
    if not pa.types.is_dictionary(conv.type):
        conv = pc.dictionary_encode(conv)
    codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    part = batch["part"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = (part << np.int64(32)) | codes
    # A packed row per RUN of equal (part, conv), not per unique value:
    # ingest layouts keep a conv's turns contiguous, so runs ~ convs and
    # the list arrays wrap the ORIGINAL buffers zero-copy (no sort, no
    # gather). A conv split across several runs just yields several
    # packed rows — the reduce side merges them anyway. Only when the
    # block is badly interleaved (runs > n/4) is a sort worth its cost.
    new_run = np.r_[True, key[1:] != key[:-1]]
    n_runs = int(new_run.sum())
    if n_runs > n // 4:
        order = np.argsort(key)
        key = key[order]
        part_s = part[order]
        codes_s = codes[order]
        ti = (
            batch["turn_idx"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[order]
        )
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)[order]
        m = batch["m"].to_numpy(zero_copy_only=False)[order]
        new_run = np.r_[True, key[1:] != key[:-1]]
    else:
        part_s = part
        codes_s = codes
        ti = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        m = batch["m"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(new_run)
    offsets = pa.array(
        np.append(starts, n).astype(np.int32), type=pa.int32()
    )
    return pa.table(
        {
            "part": pa.array(part_s[starts].astype(np.int32), type=pa.int32()),
            # dictionary-encoded conv ids: per-run codes over this
            # block's dictionary (same shuffle-byte trick as DeriveAssign)
            "conv_id": pa.DictionaryArray.from_arrays(
                pa.array(codes_s[starts].astype(np.int32), type=pa.int32()),
                conv.dictionary,
            ),
            "ti": pa.ListArray.from_arrays(offsets, pa.array(ti)),
            "ts": pa.ListArray.from_arrays(offsets, pa.array(ts)),
            "m": pa.ListArray.from_arrays(offsets, pa.array(m)),
        }
    )


def unpack_packed(batch: pa.Table) -> pa.Table:
    """Inverse of :func:`pack_derived` for one co-located partition group:
    flatten the list columns back to derived rows (row order is
    irrelevant — the worker sorts and dedups internally)."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int64()),
                "ts_us": pa.array([], type=pa.int64()),
                "m": pa.array([], type=pa.float64()),
            }
        )
    b = batch.combine_chunks()
    ti = b["ti"].combine_chunks()
    counts = pc.list_value_length(ti).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return pa.table(
        {
            "conv_id": b["conv_id"].take(pa.array(row_idx)),
            "turn_idx": ti.flatten(),
            "ts_us": b["ts"].combine_chunks().flatten(),
            "m": b["m"].combine_chunks().flatten(),
        }
    )


def detect_hot_convs(ds, threshold: int):
    """Pre-pass: per-batch partial counts -> tiny groupby -> hot conv list.

    The shuffle moves one row per (batch, conv), i.e. orders of magnitude
    less than the data; the result is small enough to broadcast.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts = batch.group_by("conv_id").aggregate([("conv_id", "count")])
        return pa.table(
            {
                "conv_id": counts["conv_id"],
                "cnt": counts["conv_id_count"].cast(pa.int64()),
            }
        )

    # one partial row per (block, conv): batch_size=None is essential —
    # default 1024-row batches would emit millions of partial rows
    counts = ds.select_columns(["conv_id"]).map_batches(
        partial_counts, batch_format="pyarrow", batch_size=None
    )
    total = counts.groupby("conv_id").sum("cnt")
    hot = total.map_batches(
        lambda b: b.filter(pc.greater_equal(b["sum(cnt)"], threshold)),
        batch_format="pyarrow",
        batch_size=None,
    )
    return [r["conv_id"] for r in hot.take_all()]


# ---------------------------------------------------------------------------
# per-partition tier cascade
# ---------------------------------------------------------------------------


def _segment_starts(*keys: np.ndarray) -> np.ndarray:
    """Start offsets of runs of equal key tuples (arrays already sorted)."""
    n = keys[0].shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return np.flatnonzero(change).astype(np.int64)


def _bin_series(
    codes: np.ndarray,
    slot: np.ndarray,
    m: np.ndarray,
    w: np.ndarray,
    starts: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Collapse each (conv, slot) segment to its Bins-semantics bin:
    returns (codes_b, slot_b, m_b, w_b)."""
    ends = np.r_[starts[1:], codes.shape[0]]
    n = (ends - starts).astype(np.float64)
    sum_w = np.add.reduceat(w, starts)
    sum_mw = np.add.reduceat(m * w, starts)
    return codes[starts], slot[starts], sum_mw / sum_w, sum_w / n


def _gap_fill(
    codes: np.ndarray,
    slot: np.ndarray,
    m: np.ndarray,
    w: np.ndarray,
    mode: str,
    max_gap: int | None,
    seg: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fill missing integer slots between consecutive bins of each conv.

    mode 'prev': copy previous bin's (m, w); 'linear': linear interpolation
    of both towards the next bin. Gaps longer than ``max_gap`` slots are
    left unfilled. Input sorted by (codes, slot); output likewise.

    ``seg`` (same length as codes) is an extra segmentation key: fills never
    cross a seg boundary. Used to truncate gap-fill at salt-window edges for
    hot conversations, so a hot conv's output is identical whether or not
    two of its salt windows happen to hash into the same partition (output
    must be independent of num_partitions).
    """
    if mode == "none" or codes.shape[0] == 0:
        return codes, slot, m, w
    same = codes[1:] == codes[:-1]
    if seg is not None:
        same = same & (seg[1:] == seg[:-1])
    gap = np.where(same, slot[1:] - slot[:-1] - 1, 0)
    if max_gap is not None:
        gap = np.where(gap > max_gap, 0, gap)
    fill_after = np.r_[gap, 0]
    counts = 1 + fill_after
    total = int(counts.sum())
    if total == codes.shape[0]:
        return codes, slot, m, w
    idx = np.repeat(np.arange(codes.shape[0]), counts)
    out_codes = codes[idx]
    # offset within each run: 0 for the real bin, 1..gap for fills
    run_starts = np.r_[0, np.cumsum(counts)[:-1]]
    offsets = np.arange(total) - run_starts[idx]
    out_slot = slot[idx] + offsets
    if mode == "prev":
        out_m = m[idx]
        out_w = w[idx]
    elif mode == "linear":
        nxt = np.minimum(idx + 1, codes.shape[0] - 1)
        denom = (fill_after[idx] + 1).astype(np.float64)
        frac = offsets / denom
        out_m = m[idx] + frac * (m[nxt] - m[idx])
        out_w = w[idx] + frac * (w[nxt] - w[idx])
    else:
        raise ValueError(f"unknown gap_fill mode {mode!r}")
    return out_codes, out_slot, out_m, out_w


def _encode_points(
    ts_us: np.ndarray, m: np.ndarray, starts: np.ndarray
) -> pa.Array:
    # Arrow-native: packed buffer + offsets, no per-bucket Python objects
    return gorilla.encode_segments_arrow(ts_us, m, starts)


class RollupWorker:
    """Actor-pool callable: processes one partition table into tier rows.

    ``hot_list`` must be the same hot-conversation set given to
    :class:`DeriveAssign`: gap-fill for those convs is truncated at
    salt-window boundaries (see ``_gap_fill``) so results do not depend on
    which salt windows co-hash into this partition.
    """

    def __init__(self, config: RollupConfig, hot_list: Iterable[str] | None = None):
        self.config = config
        self.suite = GroupedSuite(config.extractor(), config.fill_value)
        self.feature_names = self.suite.names
        self.hot = frozenset(hot_list) if hot_list else frozenset()

    def _hot_codes(self, dictionary: pa.Array) -> np.ndarray | None:
        """Boolean mask over dictionary codes: which convs are hot."""
        if not self.hot:
            return None
        mask = np.fromiter(
            (v in self.hot for v in dictionary.to_pylist()),
            dtype=bool,
            count=len(dictionary),
        )
        return mask if mask.any() else None

    def _tier_table(
        self,
        dictionary: pa.Array,
        codes: np.ndarray,
        bucket_us: np.ndarray,
        starts: np.ndarray,
        feats: dict[str, np.ndarray],
        points: pa.Array | None,
        tier: str,
        n_pts: np.ndarray,
    ) -> pa.Table:
        nseg = starts.shape[0]
        cols: dict[str, Any] = {
            "conv_id": pa.DictionaryArray.from_arrays(
                pa.array(codes, type=pa.int32()), dictionary
            ).cast(pa.string()),
            "tier": pa.array(np.repeat(tier, nseg), type=pa.string()),
            "bucket_ts": pa.array(bucket_us, type=pa.timestamp("us")),
            "n_points": pa.array(n_pts, type=pa.int64()),
        }
        if points is not None:
            cols["points"] = points
        for name in self.feature_names:
            cols[name] = pa.array(feats[name], type=pa.float64())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        if batch.num_rows == 0:
            return self._empty()
        conv_dict = pc.dictionary_encode(batch["conv_id"].combine_chunks())
        codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = conv_dict.dictionary
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = batch["ts_us"].to_numpy(zero_copy_only=False)
        m = batch["m"].to_numpy(zero_copy_only=False)

        # single argsort on a composite key beats a 2-key lexsort (turn_idx
        # is int32 so (code << 32) | turn is collision-free)
        order = np.argsort((codes << np.int64(32)) | turn)
        codes, turn, ts_us, m = codes[order], turn[order], ts_us[order], m[order]
        keep = np.ones(codes.shape[0], dtype=bool)
        keep[1:] = (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])
        if not keep.all():
            # duplicates present: arrival order is not deterministic across
            # Ray retries/runs, so break ties on (min ts_us, then min m) —
            # resume/retry must produce identical bytes (state/checkpoint.py)
            order = np.lexsort((m, ts_us, turn, codes))
            codes, turn, ts_us, m = (
                codes[order],
                turn[order],
                ts_us[order],
                m[order],
            )
            keep[1:] = (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])
            codes, turn, ts_us, m = codes[keep], turn[keep], ts_us[keep], m[keep]
        w = np.ones_like(m)

        tables = []
        # ---- tier 1m: features over raw points --------------------------
        slot = ts_us // US_PER_MIN  # integer minute index
        # within conv, turn order is normally time order already — verify
        # with one cheap pass and only re-sort when a conv's ts regresses
        sorted_ok = bool(
            np.all((codes[1:] != codes[:-1]) | (slot[1:] >= slot[:-1]))
        )
        if not sorted_ok:
            order2 = np.lexsort((turn, slot, codes))
            codes, turn, ts_us, m, slot = (
                x[order2] for x in (codes, turn, ts_us, m, slot)
            )
        t_sec = ts_us.astype(np.float64) / 1e6
        starts = _segment_starts(codes, slot)
        if "1m" in cfg.tiers:
            feats = self.suite.eval(t_sec, m, w, starts)
            points = (
                _encode_points(ts_us, m, starts) if cfg.store_points else None
            )
            ends = np.r_[starts[1:], codes.shape[0]]
            tables.append(
                self._tier_table(
                    dictionary,
                    codes[starts],
                    slot[starts] * US_PER_MIN,
                    starts,
                    feats,
                    points,
                    "1m",
                    (ends - starts).astype(np.int64),
                )
            )

        # ---- 1m bin series -> gap-fill -> 1h ----------------------------
        codes_b, slot_b, m_b, w_b = _bin_series(codes, slot, m, w, starts)
        mode_1m = cfg.gap_fill if "1m" in cfg.fill_levels else "none"
        hot_codes = self._hot_codes(dictionary)
        seg_b = None
        if hot_codes is not None:
            sw = slot_b // (1440 * cfg.salt_window_days)
            seg_b = np.where(hot_codes[codes_b], sw, 0)
        codes_f, slot_f, m_f, w_f = _gap_fill(
            codes_b, slot_b, m_b, w_b, mode_1m, cfg.max_fill_gap, seg_b
        )
        if "1h" in cfg.tiers or "1d" in cfg.tiers:
            hour = slot_f // 60
            t_f = (slot_f * 60 + 30).astype(np.float64)  # 1m bin centers, sec
            ts_f_us = (slot_f * 60 + 30) * 1_000_000
            starts_h = _segment_starts(codes_f, hour)
            if "1h" in cfg.tiers:
                feats_h = self.suite.eval(t_f, m_f, w_f, starts_h)
                points_h = (
                    _encode_points(ts_f_us, m_f, starts_h)
                    if cfg.store_points
                    else None
                )
                ends_h = np.r_[starts_h[1:], codes_f.shape[0]]
                tables.append(
                    self._tier_table(
                        dictionary,
                        codes_f[starts_h],
                        hour[starts_h] * (60 * US_PER_MIN),
                        starts_h,
                        feats_h,
                        points_h,
                        "1h",
                        (ends_h - starts_h).astype(np.int64),
                    )
                )

            # ---- 1h bin series -> gap-fill -> 1d ------------------------
            if "1d" in cfg.tiers:
                codes_hb, hour_hb, m_hb, w_hb = _bin_series(
                    codes_f, hour, m_f, w_f, starts_h
                )
                max_gap_h = (
                    None
                    if cfg.max_fill_gap is None
                    else max(cfg.max_fill_gap // 60, 1)
                )
                mode_1h = cfg.gap_fill if "1h" in cfg.fill_levels else "none"
                seg_hb = None
                if hot_codes is not None:
                    sw_h = hour_hb // (24 * cfg.salt_window_days)
                    seg_hb = np.where(hot_codes[codes_hb], sw_h, 0)
                codes_g, hour_g, m_g, w_g = _gap_fill(
                    codes_hb, hour_hb, m_hb, w_hb, mode_1h, max_gap_h, seg_hb
                )
                day = hour_g // 24
                t_g = (hour_g * 3600 + 1800).astype(np.float64)
                ts_g_us = (hour_g * 3600 + 1800) * 1_000_000
                starts_d = _segment_starts(codes_g, day)
                feats_d = self.suite.eval(t_g, m_g, w_g, starts_d)
                points_d = (
                    _encode_points(ts_g_us, m_g, starts_d)
                    if cfg.store_points
                    else None
                )
                ends_d = np.r_[starts_d[1:], codes_g.shape[0]]
                tables.append(
                    self._tier_table(
                        dictionary,
                        codes_g[starts_d],
                        day[starts_d] * (1440 * US_PER_MIN),
                        starts_d,
                        feats_d,
                        points_d,
                        "1d",
                        (ends_d - starts_d).astype(np.int64),
                    )
                )

        return pa.concat_tables(tables) if tables else self._empty()

    def _empty(self) -> pa.Table:
        cols: dict[str, Any] = {
            "conv_id": pa.array([], type=pa.string()),
            "tier": pa.array([], type=pa.string()),
            "bucket_ts": pa.array([], type=pa.timestamp("us")),
            "n_points": pa.array([], type=pa.int64()),
        }
        if self.config.store_points:
            cols["points"] = pa.array([], type=pa.binary())
        for name in self.feature_names:
            cols[name] = pa.array([], type=pa.float64())
        return pa.table(cols)
