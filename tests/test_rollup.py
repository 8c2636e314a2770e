"""Rollup engine correctness: the vectorized Ray cascade must match a naive
per-conversation composition of the pure per-series kernel (Series + Bins +
gap-fill), per FIXTURES.md §E."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from light_curve_feature_ray.codec import gorilla
from light_curve_feature_ray.features import FeatureExtractor, Series
from light_curve_feature_ray.pipelines.rollup import rollup_table
from light_curve_feature_ray.sources.synth import synth_transcripts_table
from light_curve_feature_ray.stages.rollup import RollupConfig, _gap_fill

US_PER_MIN = 60_000_000

SIMPLE_FEATURES = (
    "observation_count",
    "mean",
    "weighted_mean",
    "standard_deviation",
    "amplitude",
    "duration",
    "skew",
    "kurtosis",
    "eta",
    "eta_e",
    "stetson_k",
    "linear_trend",
    "median",
    "median_absolute_deviation",
    "cusum",
)


def naive_rollup(table: pa.Table, cfg: RollupConfig) -> pd.DataFrame:
    """Slow, obviously-correct per-conv implementation used as the oracle."""
    extractor = FeatureExtractor.from_config(list(cfg.features))
    names = extractor.names()
    df = table.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["m"] = df["text"].str.len().astype(float)
    rows = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        g = g.sort_values("turn_idx", kind="stable").drop_duplicates(
            "turn_idx", keep="first"
        )
        ts_us = g["ts_us"].to_numpy()
        m = g["m"].to_numpy()
        w = np.ones_like(m)
        t = ts_us / 1e6
        minute = ts_us // US_PER_MIN

        # --- 1m from raw points
        for j in np.unique(minute):
            sel = minute == j
            s = Series(t[sel], m[sel], w[sel])
            vals = extractor.eval_or_fill(s)
            rows.append(
                {"conv_id": conv_id, "tier": "1m", "bucket_us": j * US_PER_MIN}
                | dict(zip(names, vals))
            )

        # --- 1m bin series (Bins semantics)
        uj, inv = np.unique(minute, return_inverse=True)
        sw = np.bincount(inv, weights=w)
        smw = np.bincount(inv, weights=m * w)
        cnt = np.bincount(inv)
        bm = smw / sw
        bw = sw / cnt
        # gap-fill
        fj, fm, fw = naive_gap_fill(uj, bm, bw, cfg.gap_fill, cfg.max_fill_gap)

        # --- 1h from filled 1m bins
        hour = fj // 60
        bt = fj * 60.0 + 30.0
        for h in np.unique(hour):
            sel = hour == h
            s = Series(bt[sel], fm[sel], fw[sel])
            vals = extractor.eval_or_fill(s)
            rows.append(
                {
                    "conv_id": conv_id,
                    "tier": "1h",
                    "bucket_us": int(h) * 60 * US_PER_MIN,
                }
                | dict(zip(names, vals))
            )

        # --- 1h bin series, gap-fill, 1d
        uh, invh = np.unique(hour, return_inverse=True)
        swh = np.bincount(invh, weights=fw)
        smwh = np.bincount(invh, weights=fm * fw)
        cnth = np.bincount(invh)
        hm = smwh / swh
        hw = swh / cnth
        max_gap_h = (
            None if cfg.max_fill_gap is None else max(cfg.max_fill_gap // 60, 1)
        )
        fh, fhm, fhw = naive_gap_fill(uh, hm, hw, cfg.gap_fill, max_gap_h)
        day = fh // 24
        ht = fh * 3600.0 + 1800.0
        for d in np.unique(day):
            sel = day == d
            s = Series(ht[sel], fhm[sel], fhw[sel])
            vals = extractor.eval_or_fill(s)
            rows.append(
                {
                    "conv_id": conv_id,
                    "tier": "1d",
                    "bucket_us": int(d) * 1440 * US_PER_MIN,
                }
                | dict(zip(names, vals))
            )
    return pd.DataFrame(rows)


def naive_gap_fill(slots, m, w, mode, max_gap):
    if mode == "none":
        return slots, m, w
    out_j, out_m, out_w = [], [], []
    for i in range(len(slots)):
        out_j.append(slots[i])
        out_m.append(m[i])
        out_w.append(w[i])
        if i + 1 < len(slots):
            gap = slots[i + 1] - slots[i] - 1
            if gap <= 0 or (max_gap is not None and gap > max_gap):
                continue
            for k in range(1, gap + 1):
                out_j.append(slots[i] + k)
                if mode == "prev":
                    out_m.append(m[i])
                    out_w.append(w[i])
                else:
                    frac = k / (gap + 1)
                    out_m.append(m[i] + frac * (m[i + 1] - m[i]))
                    out_w.append(w[i] + frac * (w[i + 1] - w[i]))
    return np.array(out_j), np.array(out_m), np.array(out_w)


def compare_frames(got: pd.DataFrame, want: pd.DataFrame, names):
    key = ["conv_id", "tier", "bucket_us"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    for k in key:
        assert (got[k].values == want[k].values).all(), k
    for name in names:
        a, b = got[name].to_numpy(), want[name].to_numpy()
        na, nb = np.isnan(a), np.isnan(b)
        np.testing.assert_array_equal(na, nb, err_msg=f"{name} NaN mask")
        np.testing.assert_allclose(
            a[~na], b[~nb], rtol=1e-9, atol=1e-9, err_msg=name
        )


@pytest.mark.parametrize("gap_fill", ["none", "prev", "linear"])
def test_cascade_matches_naive(gap_fill):
    cfg = RollupConfig(
        features=SIMPLE_FEATURES,
        gap_fill=gap_fill,
        store_points=False,
        hot_threshold=None,
    )
    tbl = synth_transcripts_table(
        n_convs=12, mean_turns=60, hot_convs=1, hot_turns=400, seed=5
    )
    out = rollup_table(tbl, cfg).to_pandas()
    out["bucket_us"] = out["bucket_ts"].astype("int64")
    want = naive_rollup(tbl, cfg)
    names = FeatureExtractor.from_config(list(cfg.features)).names()
    compare_frames(out, want, names)


def test_dedup_deterministic_min_key():
    """Duplicate (conv_id, turn_idx) rows resolve by (min ts, then min m),
    NOT by arrival order — Ray does not guarantee block arrival order across
    retries, and checkpoint resume promises identical bytes."""
    tbl = synth_transcripts_table(n_convs=5, mean_turns=30, hot_convs=0, seed=9)
    # duplicates with a longer text (larger m, same ts) must LOSE the tie
    dup = tbl.slice(3, 10)
    dup = dup.set_column(
        dup.schema.get_field_index("text"),
        "text",
        pa.array(["Z" * 600 for _ in range(dup.num_rows)]),
    )
    cfg = RollupConfig(
        features=("observation_count", "mean"),
        store_points=False,
        hot_threshold=None,
    )

    def run(t):
        return (
            rollup_table(t, cfg)
            .to_pandas()
            .sort_values(["conv_id", "tier", "bucket_ts"])
            .reset_index(drop=True)
        )

    a = run(tbl)
    b = run(pa.concat_tables([tbl, dup]))  # dup arrives after
    c = run(pa.concat_tables([dup, tbl]))  # dup arrives first
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_points_roundtrip_1m():
    tbl = synth_transcripts_table(n_convs=4, mean_turns=50, hot_convs=0, seed=3)
    cfg = RollupConfig(
        features=("observation_count",), store_points=True, hot_threshold=None
    )
    out = rollup_table(tbl, cfg)
    m1 = out.filter(pc.equal(out["tier"], "1m")).to_pandas()
    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["m"] = df["text"].str.len().astype(float)
    for _, row in m1.head(50).iterrows():
        ts_dec, m_dec = gorilla.decode(row["points"])
        j = (row["bucket_ts"].value // 1000) // US_PER_MIN  # Timestamp.value is ns
        sel = df[
            (df["conv_id"] == row["conv_id"]) & (df["ts_us"] // US_PER_MIN == j)
        ].sort_values("turn_idx")
        np.testing.assert_array_equal(ts_dec, sel["ts_us"].to_numpy())
        np.testing.assert_array_equal(m_dec, sel["m"].to_numpy())
        assert row["n_points"] == len(sel)


def test_gap_fill_exact_values():
    codes = np.zeros(3, dtype=np.int64)
    slots = np.array([10, 11, 15], dtype=np.int64)
    m = np.array([1.0, 2.0, 10.0])
    w = np.array([1.0, 1.0, 2.0])
    c, s, m2, w2 = _gap_fill(codes, slots, m, w, "linear", None)
    np.testing.assert_array_equal(s, [10, 11, 12, 13, 14, 15])
    np.testing.assert_allclose(m2, [1.0, 2.0, 4.0, 6.0, 8.0, 10.0])
    np.testing.assert_allclose(w2, [1.0, 1.0, 1.25, 1.5, 1.75, 2.0])
    c, s, m2, w2 = _gap_fill(codes, slots, m, w, "prev", None)
    np.testing.assert_allclose(m2, [1.0, 2.0, 2.0, 2.0, 2.0, 10.0])
    np.testing.assert_allclose(w2, [1.0, 1.0, 1.0, 1.0, 1.0, 2.0])
    # max_gap: gap of 3 not filled when cap is 2
    c, s, m2, w2 = _gap_fill(codes, slots, m, w, "linear", 2)
    np.testing.assert_array_equal(s, [10, 11, 15])
    # gaps never cross conversations
    codes = np.array([0, 1], dtype=np.int64)
    slots = np.array([0, 5], dtype=np.int64)
    c, s, m2, w2 = _gap_fill(
        codes, slots, np.array([1.0, 2.0]), np.array([1.0, 1.0]), "linear", None
    )
    np.testing.assert_array_equal(s, [0, 5])


@pytest.mark.parametrize(
    "salted,gap_fill",
    [
        (True, "none"),  # salting is value-preserving when no state crosses days
        (False, "linear"),
    ],
)
def test_ray_pipeline_matches_inprocess(ray_session, tmp_path, salted, gap_fill):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.rollup import (
        read_transcripts,
        rollup_dataset,
    )
    from light_curve_feature_ray.sources.synth import synth_transcripts_parquet

    path = synth_transcripts_parquet(
        str(tmp_path / "synth"),
        shards=4,
        n_convs=30,
        mean_turns=40,
        hot_convs=2,
        hot_turns=300,
        seed=11,
    )
    cfg = RollupConfig(
        features=SIMPLE_FEATURES,
        num_partitions=8,
        hot_threshold=250 if salted else None,  # the two hot convs exceed 250
        gap_fill=gap_fill,
        store_points=False,
    )
    ds = read_transcripts(path)
    got = rollup_dataset(ds, cfg).to_pandas()
    got["bucket_us"] = got["bucket_ts"].astype("int64")

    tbl = synth_transcripts_table(
        n_convs=30, mean_turns=40, hot_convs=2, hot_turns=300, seed=11
    )
    cfg_local = RollupConfig(
        features=SIMPLE_FEATURES,
        gap_fill=gap_fill,
        store_points=False,
        hot_threshold=None,
    )
    want = rollup_table(tbl, cfg_local).to_pandas()
    want["bucket_us"] = want["bucket_ts"].astype("int64")
    names = FeatureExtractor.from_config(list(SIMPLE_FEATURES)).names()
    compare_frames(got, want, names)


def test_apply_retention(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.rollup import apply_retention

    now_us = 1_700_000_000 * 1_000_000
    day = 86_400 * 1_000_000
    tbl = pa.table(
        {
            "tier": pa.array(["1m", "1m", "1h", "1h", "1d", "1d"]),
            "bucket_ts": pa.array(
                [now_us - 3 * day, now_us - day,        # 1m: old, fresh
                 now_us - 9 * day, now_us - 2 * day,    # 1h: old, fresh
                 now_us - 400 * day, now_us - day],     # 1d: kept forever
                type=pa.timestamp("us"),
            ),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    out = apply_retention(
        rd.from_arrow(tbl), now_us,
        {"1m": 2 * 86400, "1h": 7 * 86400, "1d": None},
    ).to_pandas()
    assert sorted(out["v"]) == [2.0, 4.0, 5.0, 6.0]


def test_actor_pool_worker_matches_tasks(ray_session):
    """rollup_dataset(worker_concurrency=...) runs RollupWorker as an
    actor pool (per-actor state in __init__); output must be identical to
    the default task path."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.rollup import (
        read_transcripts,
        rollup_dataset,
    )
    from light_curve_feature_ray.sources.synth import synth_transcripts_parquet

    d = synth_transcripts_parquet(
        "/tmp/lcf_actor_pool_test/in", shards=2,
        n_convs=10, mean_turns=40, hot_convs=1, hot_turns=600, seed=31,
    )
    cfg = RollupConfig(
        features=("observation_count", "mean", "eta"),
        num_partitions=6,
        hot_threshold=300,
        store_points=True,
    )

    def run(**kw):
        df = rollup_dataset(read_transcripts(d), cfg, **kw).to_pandas()
        return df.sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(
            drop=True
        )

    tasks = run()
    actors = run(worker_concurrency=2)
    pd.testing.assert_frame_equal(tasks, actors)


def test_auto_num_partitions_rule():
    from light_curve_feature_ray.stages.rollup import auto_num_partitions

    # rows-per-partition band: 9.5M rows -> the measured-optimal ~96
    assert auto_num_partitions(9_534_677, num_cpus=32) == 96
    # small inputs floor at 2 tasks/cpu but never shatter below 1k rows/part
    assert auto_num_partitions(953_000, num_cpus=32) == 64
    assert auto_num_partitions(5_000, num_cpus=32) == 5
    assert auto_num_partitions(0, num_cpus=8) == 1
    # scales linearly with input at fixed cpus (100-TB posture)
    assert auto_num_partitions(953_000_000, num_cpus=32) == 9530


def test_auto_partitions_resolution(ray_session):
    """RollupConfig(num_partitions=None) resolves deterministically and
    produces the same rows as an explicit partition count (partition-count
    invariance extends to the auto rule)."""
    from dataclasses import replace

    import ray.data as rd

    from light_curve_feature_ray.pipelines.rollup import rollup_dataset, rollup_table
    from light_curve_feature_ray.stages.rollup import RollupConfig

    turns_table = synth_transcripts_table(n_convs=40, seed=3)
    cfg_auto = RollupConfig(
        features=("observation_count", "mean"), tiers=("1h",),
        gap_fill="none", hot_threshold=None, store_points=False,
    )
    assert cfg_auto.num_partitions is None
    out_auto = rollup_table(turns_table, cfg_auto)
    out_16 = rollup_table(turns_table, replace(cfg_auto, num_partitions=16))
    a = out_auto.to_pandas().sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(drop=True)
    b = out_16.to_pandas().sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)

    ds = rd.from_arrow(turns_table)
    out_ds = (
        rollup_dataset(ds, cfg_auto)
        .to_pandas()
        .sort_values(["conv_id", "tier", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out_ds[a.columns], a)
