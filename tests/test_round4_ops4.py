"""Round-4 batch-4 operators: Z-order layout keys (and siblings added
late in the round).

Contracts pinned here (the driver testdata can't exercise them):
- null ids / null or NaN coordinates drop on both sides, verified
  against the ACTUAL oracle SQL from __ray_entry__ over a synthetic
  null-bearing table;
- the Morton interleave matches a per-row brute force;
- degenerate (constant) axes collapse to bucket 0;
- output is invariant to block layout (row-level map).
"""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test_r4b4", "__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _round6(v):
    v = np.asarray(v, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(v) * 1e6 + 0.5) / 1e6, v)
    return np.where(np.isnan(v), np.nan, out)


@pytest.fixture(scope="module")
def null_events_z():
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(-50, 1_000_000, size=n).astype(np.int64),
            "value": rng.normal(scale=30, size=n),
        }
    )
    df["event_id"] = df["event_id"].astype("Int64")
    df["user_id"] = df["user_id"].astype("Int64")
    df.loc[df.index % 11 == 0, "event_id"] = pd.NA
    df.loc[df.index % 13 == 0, "user_id"] = pd.NA
    df.loc[df.index % 17 == 0, "value"] = np.nan
    return df


def _brute_zkey(xb: int, yb: int) -> int:
    z = 0
    for i in range(16):
        z |= ((xb >> i) & 1) << (2 * i + 1)
        z |= ((yb >> i) & 1) << (2 * i)
    return z


def test_zorder_brute_force_and_corners(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.scan import zorder_key

    n = 300
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 2**31, size=n).astype(np.int64),
            "value": rng.normal(scale=1e3, size=n),
        }
    )
    got = (
        zorder_key(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == n
    for _, r in got.head(50).iterrows():
        assert int(r["zkey"]) == _brute_zkey(int(r["xb"]), int(r["yb"]))
    # global min lands in bucket 0 on each axis; max in the top bucket
    imin_x = int(df["user_id"].idxmin())
    imax_x = int(df["user_id"].idxmax())
    assert int(got.loc[imin_x, "xb"]) == 0
    assert int(got.loc[imax_x, "xb"]) == 65535
    assert got["zkey"].between(0, 2**32 - 1).all()
    # x is the major axis: xb alone at yb=0 doubles the interleave
    assert _brute_zkey(1, 0) == 2 and _brute_zkey(0, 1) == 1
    assert _brute_zkey(65535, 65535) == 2**32 - 1


def test_zorder_null_parity_vs_twin(ray_session, entry_mod, null_events_z):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.scan import zorder_key

    got = (
        zorder_key(rd.from_pandas(null_events_z))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_z)
    want = (
        con.execute(entry_mod._build_sql_events_zorder())
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("event_id", "xb", "yb", "zkey"):
        assert list(got[c].astype(np.int64)) == list(
            want[c].astype(np.int64)
        ), c


def test_zorder_constant_axis_and_block_invariance(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.scan import zorder_key

    df = pd.DataFrame(
        {
            "event_id": np.arange(64, dtype=np.int64),
            "user_id": np.full(64, 7, dtype=np.int64),
            "value": np.linspace(0.0, 1.0, 64),
        }
    )
    outs = []
    for blocks in (1, 9):
        outs.append(
            zorder_key(rd.from_pandas(df).repartition(blocks))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["xb"] == 0).all()  # degenerate axis -> bucket 0
    # with xb = 0 the zkey is just the spread of yb: strictly increasing
    # in yb, so the 1-D order is preserved
    assert outs[0]["zkey"].is_monotonic_increasing


def test_zorder_bits_bound(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.scan import zorder_key

    df = pd.DataFrame(
        {
            "event_id": [1],
            "user_id": [1],
            "value": [1.0],
        }
    )
    with pytest.raises(ValueError):
        zorder_key(rd.from_pandas(df), bits=17)


@pytest.fixture(scope="module")
def null_events_ks():
    rng = np.random.default_rng(41)
    n = 600
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase", "refund"], size=n
            ),
            "value": rng.normal(scale=30, size=n),
        }
    )
    # a drifted type: same labels, shifted values for odd ids
    drift = df["event_type"] == "refund"
    df.loc[drift & (df["event_id"] % 2 == 1), "value"] += 40.0
    df["event_id"] = df["event_id"].astype("Int64")
    df.loc[df.index % 11 == 0, "event_id"] = pd.NA
    df.loc[df.index % 13 == 0, "event_type"] = None
    df.loc[df.index % 17 == 0, "value"] = np.nan
    # ties: force duplicate values inside one type
    df.loc[df.index % 19 == 0, "value"] = 5.0
    return df


def _brute_ks(a: np.ndarray, b: np.ndarray) -> float:
    """Reference two-sample KS: pooled distinct points, F(v) = #(x<=v)/n
    (the scipy.stats.ks_2samp statistic definition)."""
    pool = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pool, side="right") / a.size
    fb = np.searchsorted(np.sort(b), pool, side="right") / b.size
    return float(np.abs(fa - fb).max())


def test_ks_drift_brute_force(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import ks_drift
    from light_curve_feature_ray.pipelines.sampling import lehmer_hash

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], size=n),
            "value": rng.normal(size=n),
        }
    )
    got = (
        ks_drift(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ia = lehmer_hash(df["event_id"].to_numpy(np.int64)) % 2 == 0
    for _, r in got.iterrows():
        m = df["event_type"] == r["event_type"]
        a = df.loc[m & ia, "value"].to_numpy()
        b = df.loc[m & ~ia, "value"].to_numpy()
        assert int(r["n_a"]) == a.size and int(r["n_b"]) == b.size
        ref = _brute_ks(a, b)
        assert abs(float(r["ks_d"]) - ref) < 1e-12, r["event_type"]
    # drift detector sanity: a shifted half-sample scores high
    df2 = df.copy()
    df2.loc[ia & (df2["event_type"] == "a"), "value"] += 100.0
    got2 = ks_drift(rd.from_pandas(df2)).to_pandas().set_index("event_type")
    assert float(got2.loc["a", "ks_d"]) > 0.9
    assert float(got2.loc["b", "ks_d"]) < 0.3


def test_ks_drift_null_parity_vs_twin(ray_session, entry_mod, null_events_ks):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import ks_drift

    got = (
        ks_drift(rd.from_pandas(null_events_ks))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_ks)
    want = (
        con.execute(entry_mod._build_sql_events_ks_drift())
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["n_a"].astype(np.int64)) == list(
        want["n_a"].astype(np.int64)
    )
    assert list(got["n_b"].astype(np.int64)) == list(
        want["n_b"].astype(np.int64)
    )
    np.testing.assert_array_equal(
        _round6(got["ks_d"]), _round6(want["ks_d"])
    )


def test_ks_drift_partition_invariance_and_empty_sample(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import ks_drift
    from light_curve_feature_ray.pipelines.sampling import lehmer_hash

    rng = np.random.default_rng(9)
    n = 240
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["x", "y"], size=n),
            "value": rng.normal(size=n),
        }
    )
    # a key whose rows ALL land in one parity sample -> dropped
    ids = np.arange(n, n + 40, dtype=np.int64)
    one_par = ids[lehmer_hash(ids) % 2 == 0]
    lone = pd.DataFrame(
        {
            "event_id": one_par,
            "event_type": "lonely",
            "value": rng.normal(size=one_par.size),
        }
    )
    df = pd.concat([df, lone], ignore_index=True)
    outs = []
    for parts, blocks in ((3, 1), (11, 7)):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(
            ks_drift(ds, num_partitions=parts)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert "lonely" not in set(outs[0]["event_type"])
    assert set(outs[0]["event_type"]) == {"x", "y"}


def test_levenshtein_bytes_fuzz_vs_duckdb():
    from light_curve_feature_ray.pipelines.text import (
        _levenshtein_bytes_batch,
    )

    rng = np.random.default_rng(3)
    alpha = list("abcdeé ü\n")
    ta, tb = [], []
    for _ in range(250):
        la, lb = rng.integers(0, 14, size=2)
        ta.append("".join(rng.choice(alpha, size=la)))
        tb.append("".join(rng.choice(alpha, size=lb)))
    ta = np.array(ta, dtype=object)
    tb = np.array(tb, dtype=object)
    got = _levenshtein_bytes_batch(ta, tb)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"a": ta, "b": tb}))
    want = con.execute("select levenshtein(a, b) from t").df().iloc[:, 0]
    # byte-level semantics pinned: multi-byte code points count per byte
    assert (got == want.to_numpy()).all()
    assert int(
        _levenshtein_bytes_batch(
            np.array(["é"], object), np.array(["e"], object)
        )[0]
    ) == 2


@pytest.fixture(scope="module")
def editdist_docs():
    rng = np.random.default_rng(11)
    vocab = np.array(
        ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]
    )
    texts = [
        " ".join(rng.choice(vocab, size=12)) for _ in range(40)
    ]
    # planted near-dups: tiny character edits of existing docs
    texts.append(texts[0].replace("a", "o", 1))
    texts.append(texts[1] + " x")
    texts.append(None)  # null text -> '' on both sides
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": pd.array(texts, dtype="string[pyarrow]"),
        }
    )
    return df


def test_edit_distance_dups_parity_and_recall(
    ray_session, entry_mod, editdist_docs
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import edit_distance_dups

    got = (
        edit_distance_dups(
            rd.from_pandas(editdist_docs),
            max_dist=entry_mod.EDITDIST_MAX,
            prefix_chars=entry_mod.EDITDIST_PREFIX_CHARS,
            hasher="poly",
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", editdist_docs)
    want = (
        con.execute(entry_mod._build_sql_doc_editdist_dups())
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("doc_a", "doc_b", "dist"):
        assert list(got[c].astype(np.int64)) == list(
            want[c].astype(np.int64)
        ), c
    # planted recall: the one-character edit of doc 0 is found with the
    # exact byte distance
    found = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 40) in found
    d0 = int(got.set_index(["doc_a", "doc_b"]).loc[(0, 40), "dist"])
    ref = con.execute(
        "select levenshtein(substr(a.text,1,?), substr(b.text,1,?)) "
        "from documents a, documents b where a.doc_id=0 and b.doc_id=40",
        [entry_mod.EDITDIST_PREFIX_CHARS] * 2,
    ).fetchone()[0]
    assert d0 == int(ref)


def test_edit_distance_dups_partition_invariance(ray_session, editdist_docs):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import edit_distance_dups

    outs = []
    for blocks in (1, 7):
        ds = rd.from_pandas(editdist_docs).repartition(blocks)
        outs.append(
            edit_distance_dups(
                ds, max_dist=30, prefix_chars=48, hasher="poly"
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.fixture(scope="module")
def null_events_hist():
    rng = np.random.default_rng(55)
    n = 500
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["view", "click", "purchase"], size=n),
            "value": rng.normal(scale=30, size=n),
            "user_id": rng.integers(0, 40, size=n).astype(np.int64),
        }
    )
    df["user_id"] = df["user_id"].astype("Int64")
    df.loc[df.index % 13 == 0, "event_type"] = None
    df.loc[df.index % 17 == 0, "value"] = np.nan
    df.loc[df.index % 11 == 0, "user_id"] = pd.NA
    return df


def test_grouped_histogram_null_parity_and_consistency(
    ray_session, entry_mod, null_events_hist
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import (
        grouped_histogram,
        histogram,
    )

    ds = rd.from_pandas(null_events_hist[["event_type", "value"]])
    got = (
        grouped_histogram(
            ds, "event_type", "value", bins=entry_mod.GHIST_BINS
        )
        .to_pandas()
        .sort_values(["event_type", "bin"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_hist)
    want = (
        con.execute(entry_mod.SQL_EVENTS_TYPE_HISTOGRAM)
        .df()
        .sort_values(["event_type", "bin"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["bin"].astype(np.int64)) == list(
        want["bin"].astype(np.int64)
    )
    assert list(got["n"].astype(np.int64)) == list(want["n"].astype(np.int64))
    # per-cell counts sum to each type's non-NaN row count
    clean = null_events_hist.dropna(subset=["event_type", "value"])
    per_type = got.groupby("event_type")["n"].sum()
    for t, cnt in clean.groupby("event_type").size().items():
        assert int(per_type[t]) == int(cnt)
    # NOTE: the grouped bounds come from ALL values (key-null rows
    # included) — so cells do NOT generally sum to the global histogram
    # of the key-filtered subset; pin the bound contract instead
    assert got["bin"].between(0, entry_mod.GHIST_BINS - 1).all()
    # degenerate range: everything lands in bin 0 (kernel-only contract)
    const = pd.DataFrame({"k": ["a", "b"] * 10, "v": [3.5] * 20})
    g2 = grouped_histogram(
        rd.from_pandas(const), "k", "v", bins=8
    ).to_pandas()
    assert (g2["bin"] == 0).all() and int(g2["n"].sum()) == 20


def test_grouped_histogram_partition_invariance(ray_session, null_events_hist):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import grouped_histogram

    outs = []
    for blocks in (1, 7):
        ds = rd.from_pandas(
            null_events_hist[["event_type", "value"]]
        ).repartition(blocks)
        outs.append(
            grouped_histogram(ds, "event_type", "value", bins=16)
            .to_pandas()
            .sort_values(["event_type", "bin"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_audience_overlap_null_parity_and_math(
    ray_session, entry_mod, null_events_hist
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import audience_overlap

    got = (
        audience_overlap(rd.from_pandas(null_events_hist))
        .to_pandas()
        .sort_values(["cat_a", "cat_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_hist)
    want = (
        con.execute(entry_mod.SQL_EVENTS_AUDIENCE_OVERLAP)
        .df()
        .sort_values(["cat_a", "cat_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("cat_a", "cat_b"):
        assert list(got[c]) == list(want[c]), c
    for c in ("n_a", "n_b", "n_ab"):
        assert list(got[c].astype(np.int64)) == list(
            want[c].astype(np.int64)
        ), c
    np.testing.assert_array_equal(
        _round6(got["jaccard"]), _round6(want["jaccard"])
    )
    np.testing.assert_array_equal(
        _round6(got["lift"]), _round6(want["lift"])
    )
    assert (got["cat_a"] < got["cat_b"]).all()


def test_audience_overlap_hand_example_and_invariance(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import audience_overlap

    # users: 1 {a,b}, 2 {a}, 3 {b,c}, 4 {a,b,c}  -> N = 4
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2, 3, 3, 4, 4, 4, 1], dtype=np.int64),
            "event_type": ["a", "b", "a", "b", "c", "a", "b", "c", "a"],
        }
    )
    outs = []
    for blocks in (1, 5):
        outs.append(
            audience_overlap(rd.from_pandas(df).repartition(blocks))
            .to_pandas()
            .sort_values(["cat_a", "cat_b"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    g = outs[0].set_index(["cat_a", "cat_b"])
    # a∩b = {1,4}, a∪b = {1,2,3,4}
    assert int(g.loc[("a", "b"), "n_ab"]) == 2
    assert abs(float(g.loc[("a", "b"), "jaccard"]) - 0.5) < 1e-15
    # lift(a,b) = (2*4)/(3*3)
    assert abs(float(g.loc[("a", "b"), "lift"]) - 8.0 / 9.0) < 1e-15
    # b∩c = {3,4}; a∩c = {4}
    assert int(g.loc[("b", "c"), "n_ab"]) == 2
    assert int(g.loc[("a", "c"), "n_ab"]) == 1


def test_first_event_latency_parity_and_negative(ray_session, entry_mod):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        first_event_latency,
    )

    rng = np.random.default_rng(77)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 60, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase"], size=n, p=[0.6, 0.3, 0.1]
            ),
        }
    )
    df["ts"] = pd.to_datetime(
        rng.integers(0, 30 * 86_400_000_000, size=n), unit="us"
    )
    # a user whose first purchase PRECEDES their first view (negative)
    extra = pd.DataFrame(
        {
            "user_id": np.array([900, 900], dtype=np.int64),
            "event_type": ["purchase", "view"],
            "ts": pd.to_datetime([1_000_000, 5_000_000], unit="us"),
        }
    )
    # a user with only views (absent from output)
    only_view = pd.DataFrame(
        {
            "user_id": np.array([901], dtype=np.int64),
            "event_type": ["view"],
            "ts": pd.to_datetime([2_000_000], unit="us"),
        }
    )
    df = pd.concat([df, extra, only_view], ignore_index=True)
    df["user_id"] = df["user_id"].astype("Int64")
    df.loc[df.index % 13 == 0, "user_id"] = pd.NA
    df.loc[df.index % 17 == 0, "ts"] = pd.NaT

    got = (
        first_event_latency(rd.from_pandas(df))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = (
        con.execute(entry_mod.SQL_EVENTS_CONVERSION_LATENCY)
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert list(got["user_id"].astype(np.int64)) == list(
        want["user_id"].astype(np.int64)
    )
    assert list(got["latency_us"].astype(np.int64)) == list(
        want["latency_us"].astype(np.int64)
    )
    for c in ("from_ts", "to_ts"):
        assert (
            got[c].astype("datetime64[us]")
            == want[c].astype("datetime64[us]")
        ).all(), c
    g = got.set_index("user_id")
    assert int(g.loc[900, "latency_us"]) == -4_000_000  # negative kept
    assert 901 not in g.index  # one-sided user absent


def test_first_event_latency_partition_invariance(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        first_event_latency,
    )

    rng = np.random.default_rng(78)
    n = 300
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, size=n).astype(np.int64),
            "event_type": rng.choice(["view", "purchase"], size=n),
        }
    )
    df["ts"] = pd.to_datetime(
        rng.integers(0, 10 * 86_400_000_000, size=n), unit="us"
    )
    outs = []
    for blocks in (1, 9):
        outs.append(
            first_event_latency(rd.from_pandas(df).repartition(blocks))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_trimmed_mean_parity(ray_session, entry_mod, null_events_hist):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import (
        grouped_trimmed_mean,
    )

    got = (
        grouped_trimmed_mean(
            rd.from_pandas(null_events_hist[["event_type", "value"]]),
            "event_type",
            "value",
            p_lo=entry_mod.TRIM_P_LO,
            p_hi=entry_mod.TRIM_P_HI,
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_hist)
    want = (
        con.execute(entry_mod.SQL_EVENTS_TRIMMED_MEAN)
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["n"].astype(np.int64)) == list(want["n"].astype(np.int64))
    np.testing.assert_array_equal(
        _round6(got["trimmed_mean"]), _round6(want["trimmed_mean"])
    )
    # robustness property: trimming tightens the range vs the raw mean
    clean = null_events_hist.dropna(subset=["event_type", "value"])
    for t, grp in clean.groupby("event_type"):
        row = got[got["event_type"] == t]
        assert int(row["n"].iloc[0]) <= len(grp)
        assert grp["value"].min() <= float(row["trimmed_mean"].iloc[0])
        assert float(row["trimmed_mean"].iloc[0]) <= grp["value"].max()


def test_grouped_trimmed_mean_partition_invariance(
    ray_session, null_events_hist
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.quantiles import (
        grouped_trimmed_mean,
    )

    outs = []
    for parts, blocks in ((3, 1), (11, 7)):
        ds = rd.from_pandas(
            null_events_hist[["event_type", "value"]]
        ).repartition(blocks)
        outs.append(
            grouped_trimmed_mean(
                ds, "event_type", "value", num_partitions=parts
            )
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
    assert list(outs[0]["event_type"]) == list(outs[1]["event_type"])
    assert list(outs[0]["n"]) == list(outs[1]["n"])
    # float sums may associate differently across block layouts; round-6
    # (the driver contract) must agree
    np.testing.assert_array_equal(
        _round6(outs[0]["trimmed_mean"]), _round6(outs[1]["trimmed_mean"])
    )
