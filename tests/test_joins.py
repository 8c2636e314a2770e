"""asof_join (pipelines/joins.py): backward as-of semantics vs a naive
per-row reference, incl. inclusive-timestamp matches, missing keys, and
partition-count invariance."""

import numpy as np
import pandas as pd
import pytest


def naive_asof(left, right, key, ts, vcol):
    out = []
    for _, lr in left.iterrows():
        cand = right[(right[key] == lr[key]) & (right[ts] <= lr[ts])]
        out.append(cand.sort_values(ts).iloc[-1][vcol] if len(cand) else np.nan)
    return np.array(out, dtype=np.float64)


def test_asof_join_matches_naive(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import asof_join

    rng = np.random.default_rng(13)
    n_l, n_r = 300, 120
    left = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, n_l),
            "ts_us": rng.integers(0, 1000, n_l).astype(np.int64),
            "event_id": np.arange(n_l, dtype=np.int64),
            "value": rng.uniform(0, 10, n_l),
        }
    )
    right = (
        pd.DataFrame(
            {
                "user_id": rng.integers(0, 15, n_r),  # users 15-19 unmatched
                "ts_us": rng.integers(0, 1000, n_r).astype(np.int64),
                "click_value": rng.uniform(0, 5, n_r),
            }
        )
        .groupby(["user_id", "ts_us"], as_index=False)
        .max()  # deterministic: unique per (key, ts)
    )
    # force an inclusive-timestamp (==) match
    left.loc[0, ["user_id", "ts_us"]] = [
        right.iloc[0]["user_id"],
        right.iloc[0]["ts_us"],
    ]
    expect = naive_asof(left, right, "user_id", "ts_us", "click_value")

    for nparts in (4, 32):
        got = (
            asof_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                key_col="user_id",
                ts_col="ts_us",
                right_value_cols=["click_value"],
                num_partitions=nparts,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert len(got) == n_l
        np.testing.assert_allclose(
            got["click_value"].to_numpy(dtype=np.float64), expect, equal_nan=True
        )
        # the == match is inclusive
        assert not np.isnan(got.loc[got["event_id"] == 0, "click_value"]).any()
        # left payload survives untouched
        np.testing.assert_allclose(
            got.sort_values("event_id")["value"].to_numpy(),
            left.sort_values("event_id")["value"].to_numpy(),
        )


def test_asof_join_rejects_exotic_payload(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import asof_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "t": pa.array([1], pa.int64()),
                "payload": pa.array([[1.0]], pa.list_(pa.float64())),
            }
        )
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "t": pa.array([0], pa.int64()),
                  "v": pa.array([2.0])})
    )
    with pytest.raises(TypeError):
        asof_join(left, right, key_col="k", ts_col="t", right_value_cols=["v"])


def test_interval_join_matches_naive(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import interval_join

    rng = np.random.default_rng(21)
    # non-overlapping intervals per key with gaps between them
    rows = []
    for k in range(8):
        t0 = 0
        for i in range(5):
            start = t0 + rng.integers(5, 20)
            end = start + rng.integers(0, 15)  # zero-length allowed
            rows.append((k, int(start), int(end), float(k * 10 + i)))
            t0 = end + rng.integers(3, 10)  # gap
    iv = pd.DataFrame(rows, columns=["k", "lo", "hi", "payload"])
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 10, 400),  # keys 8-9 have no intervals
            "t": rng.integers(0, 150, 400).astype(np.int64),
            "row_id": np.arange(400, dtype=np.int64),
        }
    )

    def naive(lk, lt):
        m = iv[(iv["k"] == lk) & (iv["lo"] <= lt) & (iv["hi"] >= lt)]
        return m["payload"].iloc[0] if len(m) else np.nan

    expect = np.array([naive(a, b) for a, b in zip(left["k"], left["t"])])

    for nparts in (4, 32):
        got = (
            interval_join(
                rd.from_pandas(left),
                rd.from_pandas(iv),
                key_col="k",
                ts_col="t",
                start_col="lo",
                end_col="hi",
                right_value_cols=["payload"],
                num_partitions=nparts,
            )
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        assert len(got) == 400
        np.testing.assert_allclose(
            got["payload"].to_numpy(dtype=np.float64), expect, equal_nan=True
        )
        # matched rows carry their interval bounds; unmatched carry NaN
        matched = ~np.isnan(expect)
        assert not got.loc[matched, "lo"].isna().any()
        assert got.loc[~matched, "hi"].isna().all()


def test_hll_distinct_accuracy_and_invariance(ray_session):
    """HLL sketch: rank computation matches int.bit_length, estimates are
    within the 3-sigma HLL bound of exact counts, and the register-max
    lattice makes output EXACTLY partition-invariant."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import (
        _hll_estimate,
        _hll_partial,
        hll_distinct,
    )

    # rank kernel vs a scalar reference
    import polars as pl

    vals = np.array([f"v{i}" for i in range(5000)], dtype=object)
    p = 12
    regs = _hll_partial(vals, p)
    h = pl.Series(vals).cast(pl.String).hash(seed=77).to_numpy().astype(np.uint64)
    expect_regs = np.zeros(1 << p, dtype=np.uint8)
    for hv in h:
        idx = int(hv >> np.uint64(64 - p))
        rest = int(hv << np.uint64(p)) & ((1 << 64) - 1)
        lz = 64 - p if rest == 0 else (64 - rest.bit_length())
        rank = min(lz, 64 - p) + 1
        expect_regs[idx] = max(expect_regs[idx], rank)
    np.testing.assert_array_equal(regs, expect_regs)

    # accuracy: 2**p registers -> sigma ~ 1.04/sqrt(m) = 1.6%
    est = _hll_estimate(regs)
    assert abs(est - 5000) / 5000 < 0.05

    # dataset surface: grouped estimate, exact partition invariance
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 30_000),
            "v": rng.integers(0, 4000, 30_000),
        }
    )
    exact = df.groupby("k")["v"].nunique()
    outs = []
    for nblocks in (2, 16):
        ds = rd.from_pandas(df).repartition(nblocks)
        out = (
            hll_distinct(ds, "v", group_col="k")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        outs.append(out)
        for _, r in out.iterrows():
            assert abs(r["approx_distinct"] - exact[r["k"]]) / exact[r["k"]] < 0.05
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hll_poly_hasher_sql_parity_and_accuracy(ray_session):
    """The ``poly`` HLL path: hash/rank/estimate are bit-identical to a
    scalar re-derivation of the SQL oracle's exact integer arithmetic,
    estimates stay within the HLL error bound, and partition invariance
    holds (same lattice argument as ahash)."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import (
        _POLY_FINAL_MULTS,
        _POLY_MOD,
        _hll_estimate_exact,
        _hll_partial_poly,
        _poly_value_hashes,
        hll_distinct,
    )

    vals = np.arange(20_000) * 7 + 3
    p = 12
    # scalar reference of the oracle's arithmetic (BIGINT-exact ops only)
    def scalar_hash(v) -> int:
        acc = 0
        for ch in str(v):
            acc = (acc * 31 + ord(ch)) % _POLY_MOD
        for mult in _POLY_FINAL_MULTS:
            acc = ((acc ^ (acc >> 21)) * mult) % _POLY_MOD
        return acc

    h = _poly_value_hashes(vals)
    assert [int(x) for x in h[:200]] == [scalar_hash(v) for v in vals[:200]]

    regs = _hll_partial_poly(vals, p)
    expect = np.zeros(1 << p, dtype=np.uint8)
    for hv in (scalar_hash(v) for v in vals):
        idx = hv >> (48 - p)
        rest = hv & ((1 << (48 - p)) - 1)
        rank = (48 - p) - rest.bit_length() + 1
        expect[idx] = max(expect[idx], rank)
    np.testing.assert_array_equal(regs, expect)

    est = _hll_estimate_exact(regs, p)
    assert abs(est - 20_000) / 20_000 < 0.05

    # estimate formula parity with a from-scratch re-derivation
    r_max = 48 - p + 1
    s_int = sum(1 << (r_max - int(r)) for r in expect)
    zeros = int((expect == 0).sum())
    m = 1 << p
    ref = 0.7213 / (1.0 + 1.079 / m) * m * m * float(2**r_max) / s_int
    if ref <= 2.5 * m and zeros:
        import math

        ref = float(m) * math.log(m / zeros)
    assert est == ref

    # dataset surface: bit-identical across partitionings
    df = pd.DataFrame(
        {"k": ["a", "b"] * 5000, "v": np.arange(10_000, dtype=np.int64)}
    )
    outs = []
    for nblocks in (2, 16):
        ds = rd.from_pandas(df).repartition(nblocks)
        outs.append(
            hll_distinct(ds, "v", group_col="k", hasher="poly")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for _, r in outs[0].iterrows():
        assert abs(r["approx_distinct"] - 5000) / 5000 < 0.06


def test_hll_distinct_empty_blocks(ray_session):
    """Empty blocks (filter leaves zero rows in some blocks) must not
    crash the grouped partial (regression: IndexError on g[0])."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import hll_distinct

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 5, "v": list(range(10))})
    ds = rd.from_pandas(df).repartition(8).filter(lambda r: r["v"] < 3)
    out = hll_distinct(ds, "v", group_col="k").to_pandas()
    assert set(out["k"]) == {"a"}
    assert abs(out["approx_distinct"].iloc[0] - 3) < 0.5
    # fully-empty input: no groups, no crash
    empty = rd.from_pandas(df).filter(lambda r: r["v"] > 99)
    assert hll_distinct(empty, "v", group_col="k").count() == 0


# ---------------------------------------------------------------------------
# Count-Min sketch (pipelines/sketches.py cms_sketch / cms_estimate)
# ---------------------------------------------------------------------------


def _cms_ids(n=30_000, seed=2):
    rng = np.random.default_rng(seed)
    # zipf-ish skew: a few heavy hitters + a long tail
    heavy = min(n // 3, 10_000)
    return np.concatenate(
        [
            np.repeat(np.arange(5, dtype=np.int64), heavy // 5),
            rng.integers(100, 5000, size=n - 5 * (heavy // 5)).astype(
                np.int64
            ),
        ]
    )


def test_cms_never_underestimates_and_is_accurate_on_heavy_hitters(
    ray_session,
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import (
        cms_estimate,
        cms_sketch,
    )

    ids = _cms_ids()
    df = pd.DataFrame({"user_id": ids})
    sketch = cms_sketch(rd.from_pandas(df), "user_id", depth=4, width=4096)
    assert sketch.shape == (4, 4096)
    assert sketch.sum() == 4 * len(ids)  # every row counts every value once

    keys, exact = np.unique(ids, return_counts=True)
    est = cms_estimate(sketch, keys)
    assert (est >= exact).all()  # one-sided error guarantee
    # overestimate bound e/width * N holds with margin on the heavy hitters
    heavy = exact >= 1000
    assert (est[heavy] - exact[heavy] <= np.e / 4096 * len(ids)).all()


def test_cms_merge_invariance(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sketches import cms_sketch

    ids = _cms_ids(5_000, seed=7)
    df = pd.DataFrame({"user_id": ids})
    sketches = [
        cms_sketch(
            rd.from_pandas([b for b in np.array_split(df, p) if len(b)]),
            "user_id",
            depth=3,
            width=512,
        )
        for p in (1, 13)
    ]
    np.testing.assert_array_equal(sketches[0], sketches[1])

    with pytest.raises(ValueError):
        cms_sketch(rd.from_pandas(df), "user_id", depth=9)


# ---------------------------------------------------------------------------
# pivot_agg (pipelines/pivot.py)
# ---------------------------------------------------------------------------


def test_pivot_agg_matches_pandas_and_is_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.pivot import pivot_agg

    rng = np.random.default_rng(8)
    n = 900
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, size=n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "zz"], size=n),
            "value": rng.normal(size=n),
        }
    )
    df.loc[rng.random(n) < 0.1, "value"] = np.nan
    outs = []
    for parts in (1, 9):
        blocks = [b for b in np.array_split(df, parts) if len(b)]
        out = (
            pivot_agg(
                rd.from_pandas(blocks),
                key_col="user_id",
                pivot_col="event_type",
                value_col="value",
                categories=["a", "b"],  # "zz" falls into _other
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    for cat, col in (("a", "a"), ("b", "b"), ("zz", "_other")):
        sub = df[(df["event_type"] == cat) & df["value"].notna()]
        ref_n = sub.groupby("user_id")["value"].count()
        ref_s = sub.groupby("user_id")["value"].sum()
        got = out.set_index("user_id")
        users = got.index
        np.testing.assert_array_equal(
            got[f"n_{col}"].to_numpy(),
            ref_n.reindex(users, fill_value=0).to_numpy(),
        )
        np.testing.assert_allclose(
            got[f"sum_{col}"].to_numpy(),
            ref_s.reindex(users).to_numpy(),  # missing -> NaN == SQL NULL
            equal_nan=True,
        )
    with pytest.raises(ValueError, match="duplicate"):
        pivot_agg(
            rd.from_pandas(df), key_col="user_id", pivot_col="event_type",
            value_col="value", categories=["a", "a"],
        )
