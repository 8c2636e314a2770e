"""Multicolor subsystem: fixtures ported from the reference's in-file tests
(multicolor_bins.rs, color_spread.rs, per_band_feature.rs,
multi_color_periodogram.rs) + pipeline equivalence."""

import numpy as np
import pandas as pd
import pytest

from light_curve_feature_ray.features.kernel import Series
from light_curve_feature_ray.features.multicolor import (
    ColorOfMaximum,
    ColorOfMedian,
    ColorOfMinimum,
    ColorSpread,
    MissingBand,
    MultiColorBins,
    MultiColorExtractor,
    MultiColorPeriodogram,
    PerBandFeature,
    mc_feature_from_config,
)


def make_gr():
    # /root/reference/src/multicolor/multicolor_bins.rs test fixture
    t = np.array([0.0, 0.1, 1.0, 1.1, 2.0])
    w = np.ones(5)
    return {
        "g": Series(t, np.array([1.0, 3.0, 5.0, 7.0, 9.0]), w),
        "r": Series(t, np.array([2.0, 4.0, 6.0, 8.0, 10.0]), w),
    }


def test_multicolor_bins_values():
    # binned (window=1, offset=0): g -> [2, 6, 9], r -> [3, 7, 10];
    # ColorOfMaximum(g, r) = 9 - 10 = -1 (multicolor_bins.rs)
    ev = MultiColorBins([ColorOfMaximum(["g", "r"])], window=1.0, offset=0.0)
    res = ev.eval(make_gr())
    assert res.shape == (1,)
    assert abs(res[0] - (-1.0)) < 1e-10


def test_multicolor_bins_names():
    ev = MultiColorBins([ColorOfMaximum(["g", "r"])], window=1.0, offset=0.0)
    assert ev.names == ["bins_window1.0_offset0.0_color_max_g_r"]


def test_color_features_values():
    mcts = make_gr()
    assert ColorOfMaximum(["g", "r"]).eval(mcts)[0] == -1.0
    assert ColorOfMinimum(["g", "r"]).eval(mcts)[0] == -1.0
    assert ColorOfMedian(["g", "r"]).eval(mcts)[0] == 5.0 - 6.0


def test_color_spread_values():
    # color_spread.rs test: mu_g=11, mu_i=15, mu_r=18 (population std)
    mcts = {
        "g": Series(np.zeros(2), np.array([10.0, 12.0]), np.ones(2)),
        "i": Series(np.zeros(2), np.array([14.0, 16.0]), np.ones(2)),
        "r": Series(np.zeros(2), np.array([17.0, 19.0]), np.ones(2)),
    }
    mu = np.array([11.0, 15.0, 18.0])
    expected = np.sqrt(((mu - mu.mean()) ** 2).mean())
    got = ColorSpread(["g", "i", "r"]).eval(mcts)[0]
    assert abs(got - expected) < 1e-10


def test_per_band_names_and_values():
    # per_band_feature.rs:241 — names are {name}_{band} in band order
    pb = PerBandFeature("mean", ["g", "r"])
    assert pb.names == ["mean_g", "mean_r"]
    res = pb.eval(make_gr())
    np.testing.assert_allclose(res, [5.0, 6.0])
    pb2 = PerBandFeature("mean", ["r", "g"])
    assert pb2.names == ["mean_r", "mean_g"]
    np.testing.assert_allclose(pb2.eval(make_gr()), [6.0, 5.0])


def test_missing_band_fill():
    ev = MultiColorExtractor([ColorOfMaximum(["g", "z"])])
    mcts = make_gr()
    with pytest.raises(MissingBand):
        ev.eval(mcts)
    out = ev.eval_or_fill(mcts, np.nan)
    assert np.isnan(out).all()


def test_multicolor_serde_roundtrip():
    ev = MultiColorBins(
        [
            ColorOfMaximum(["g", "r"]),
            ColorSpread(["g", "r"]),
            PerBandFeature({"name": "standard_deviation"}, ["g", "r"]),
        ],
        window=1.0,
        offset=0.0,
    )
    d = ev.to_dict()
    ev2 = mc_feature_from_config(d)
    assert ev2.names == ev.names
    np.testing.assert_allclose(ev2.eval(make_gr()), ev.eval(make_gr()))


def synth_two_band(period=0.75, seed=1, n_g=120, n_r=110, span=20.0):
    rng = np.random.default_rng(seed)
    tg = np.sort(rng.uniform(0, span, n_g))
    tr = np.sort(rng.uniform(0, span, n_r))
    mg = np.sin(2 * np.pi * tg / period) + 0.1 * rng.normal(size=n_g)
    mr = 0.8 * np.sin(2 * np.pi * tr / period + 0.3) + 0.1 * rng.normal(size=n_r)
    return {"g": Series(tg, mg), "r": Series(tr, mr)}


def test_multicolor_periodogram_period_recovery():
    # multi_color_periodogram.rs check_period_recovery analog: the combined
    # two-band periodogram recovers the shared period within 1%
    for seed in (1, 2, 3):
        mcts = synth_two_band(seed=seed)
        ev = MultiColorPeriodogram(["g", "r"], peaks=1, max_freq_factor=2.0)
        res = ev.eval(mcts)
        assert abs(res[0] - 0.75) / 0.75 < 0.01, (seed, res[0])


def test_multicolor_periodogram_direct_fft_agree():
    mcts = synth_two_band(seed=5)
    fast = MultiColorPeriodogram(["g", "r"], peaks=1, fast=True)
    slow = MultiColorPeriodogram(["g", "r"], peaks=1, fast=False)
    # grids differ (pow2 vs linear) so compare recovered periods
    assert abs(fast.eval(mcts)[0] - slow.eval(mcts)[0]) / 0.75 < 0.02


def test_multicolor_periodogram_weights():
    # chi2 vs count weighting both recover; weights renormalized over all
    # configured bands (multi_color_periodogram.rs:509-556)
    mcts = synth_two_band(seed=7)
    for wts in ("count", "chi2"):
        ev = MultiColorPeriodogram(
            ["g", "r"], peaks=1, normalization_weights=wts, max_freq_factor=2.0
        )
        assert abs(ev.eval(mcts)[0] - 0.75) / 0.75 < 0.01


def test_multicolor_periodogram_phase_names():
    ev = MultiColorPeriodogram(
        ["g", "r"],
        peaks=1,
        phase_bands=["g", "r"],
        phase_features=["mean", "eta"],
    )
    assert ev.names == [
        "periodogram_period_0",
        "periodogram_period_s_to_n_0",
        "period_folded_g_mean",
        "period_folded_g_eta",
        "period_folded_r_mean",
        "period_folded_r_eta",
        "period_folded_r_eta",
    ][:6]
    res = ev.eval(synth_two_band())
    assert res.shape == (6,)
    assert np.isfinite(res).all()


def test_too_short_band_skipped_but_weighted():
    # a 1-point band is skipped in the power sum but keeps weight mass
    mcts = synth_two_band(seed=3)
    mcts["z"] = Series(np.array([1.0]), np.array([0.5]))
    ev = MultiColorPeriodogram(["g", "r", "z"], peaks=1, max_freq_factor=2.0)
    res = ev.eval(mcts)
    assert abs(res[0] - 0.75) / 0.75 < 0.01


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


def _turns_table(seed=11):
    from light_curve_feature_ray.sources.synth import synth_transcripts_table

    tbl = synth_transcripts_table(
        n_convs=12, mean_turns=60, hot_convs=0, seed=seed
    )
    import pyarrow as pa

    part = pa.array(np.zeros(tbl.num_rows, dtype=np.int32))
    return tbl.append_column("part", part)


def test_conv_multicolor_pipeline_matches_local(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.multicolor import (
        conv_multicolor_features,
    )

    tbl = _turns_table()
    extractor = MultiColorExtractor(
        [
            ColorOfMedian(["assistant", "user"]),
            ColorSpread(["assistant", "tool", "user"]),
            PerBandFeature("mean", ["assistant", "user"]),
            MultiColorBins(
                [ColorOfMaximum(["assistant", "user"])], window=3600.0
            ),
        ]
    )
    ds = rd.from_arrow(tbl)
    out = (
        conv_multicolor_features(ds, extractor)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )

    # local reference: build mcts per conv from pandas and eval directly
    df = tbl.to_pandas()
    df["t"] = df["ts"].astype("int64") / 1e6
    df["m"] = df["text"].str.len().astype(float)
    expected = {}
    for conv, g in df.groupby("conv_id"):
        mcts = {}
        for band, gg in g.groupby("role"):
            gg = gg.sort_values("turn_idx")
            mcts[band] = Series(
                gg["t"].to_numpy(), gg["m"].to_numpy(), check=False
            )
        expected[conv] = extractor.eval_or_fill(mcts, np.nan)
    names = extractor.names()
    assert len(out) == len(expected)
    for _, row in out.iterrows():
        exp = expected[row["conv_id"]]
        got = np.array(
            [row[n] if row[n] is not None else np.nan for n in names],
            dtype=float,
        )
        np.testing.assert_allclose(got, exp, rtol=0, atol=0, equal_nan=True)


def test_conv_color_features_vectorized_pivot(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.multicolor import (
        conv_color_features,
    )

    tbl = _turns_table(seed=21)
    ds = rd.from_arrow(tbl)
    out = (
        conv_color_features(ds, "assistant", "user")
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    df["m"] = df["text"].str.len().astype(float)
    for _, row in out.iterrows():
        g = df[df["conv_id"] == row["conv_id"]]
        a = g[g["role"] == "assistant"]["m"]
        b = g[g["role"] == "user"]["m"]
        assert abs(row[f"color_median_assistant_user"] - (a.median() - b.median())) < 1e-9
        assert abs(row[f"color_max_assistant_user"] - (a.max() - b.max())) < 1e-9
        mus = np.array([a.mean(), b.mean()])
        assert abs(row["color_spread"] - np.sqrt(((mus - mus.mean()) ** 2).mean())) < 1e-9


def test_grouped_multicolor_matches_scalar():
    """GroupedMultiColor (vectorized many-conv path used by
    conv_multicolor_features) is exactly the per-conv scalar
    extractor.eval_or_fill across missing-band / short-series /
    flat-series edge cases, for every vectorized kind + the
    periodogram fallback."""
    import numpy as np

    from light_curve_feature_ray.features.kernel import Series
    from light_curve_feature_ray.features.multicolor import (
        ColorOfMaximum,
        ColorOfMedian,
        ColorOfMinimum,
        ColorSpread,
        GroupedMultiColor,
        MultiColorBins,
        MultiColorExtractor,
        MultiColorPeriodogram,
        PerBandFeature,
        _MCSegments,
    )

    rng = np.random.default_rng(11)
    band_names = ["assistant", "tool", "user"]
    convs = []
    for ci in range(25):
        mcts = {}
        for bi, b in enumerate(band_names):
            # vary presence and length; conv 3 has a flat band, conv 5 short
            if (ci + bi) % 4 == 0 and ci != 7:
                continue
            n = 1 if ci == 5 and bi == 0 else rng.integers(2, 30)
            t = np.sort(rng.uniform(0, 1000, n))
            m = (
                np.full(n, 3.0)
                if ci == 3 and bi == 1
                else rng.uniform(0, 50, n)
            )
            mcts[b] = (t, m)
        if mcts:
            convs.append(mcts)

    extractor = MultiColorExtractor(
        [
            ColorOfMaximum(["assistant", "user"]),
            ColorOfMedian(["assistant", "tool"]),
            ColorOfMinimum(["tool", "user"]),
            ColorSpread(["assistant", "tool", "user"]),
            PerBandFeature(
                {"name": "linear_trend"}, ["assistant", "user"]
            ),
            PerBandFeature({"name": "eta"}, ["tool"]),
            MultiColorBins(
                [
                    ColorOfMedian(["assistant", "user"]),
                    ColorSpread(["assistant", "user"]),
                ],
                window=100.0,
                offset=0.0,
            ),
            # no vectorized kernel -> exercises the per-series _fallback
            MultiColorPeriodogram(
                ["assistant", "user"],
                peaks=1,
                phase_bands=["assistant"],
                phase_features=["mean"],
            ),
        ]
    )

    # scalar reference
    expected = np.stack(
        [
            extractor.eval_or_fill(
                {b: Series(t, m, check=False) for b, (t, m) in c.items()}
            )
            for c in convs
        ]
    )

    # flat segment-major layout
    ts, ms, segs, conv_of, band_of = [], [], [], [], []
    off = 0
    for ci, c in enumerate(convs):
        for bi, b in enumerate(band_names):
            if b not in c:
                continue
            t, m = c[b]
            ts.append(t)
            ms.append(m)
            segs.append(off)
            conv_of.append(ci)
            band_of.append(bi)
            off += t.shape[0]
    t = np.concatenate(ts)
    m = np.concatenate(ms)
    ctx = _MCSegments(
        np.array(conv_of), np.array(band_of), band_names,
        t, m, np.ones_like(m), np.array(segs), len(convs),
    )
    got_cols = GroupedMultiColor(extractor).eval(ctx)
    names = extractor.names()
    got = np.stack([got_cols[n] for n in names], axis=1)
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)
