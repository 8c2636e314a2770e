"""Round-4 batch 6: Welch A/B t-test and corpus line dedup."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from light_curve_feature_ray.pipelines.aggregates import welch_t_ab
from light_curve_feature_ray.pipelines.sampling import lehmer_sql
from light_curve_feature_ray.pipelines.text import line_dedup


def _welch_sql(where_extra: str = "") -> str:
    return f"""
WITH s AS (
    SELECT key, value,
           CASE WHEN ({lehmer_sql("id")}) % 2 = 0 THEN 1 ELSE 0 END AS ia
    FROM t
    WHERE key IS NOT NULL AND id IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(value) {where_extra}
), g AS (
    SELECT key,
           count(*) FILTER (WHERE ia = 1) AS n_a,
           count(*) FILTER (WHERE ia = 0) AS n_b,
           avg(value) FILTER (WHERE ia = 1) AS m_a,
           avg(value) FILTER (WHERE ia = 0) AS m_b,
           var_samp(value) FILTER (WHERE ia = 1) AS v_a,
           var_samp(value) FILTER (WHERE ia = 0) AS v_b
    FROM s GROUP BY key
)
SELECT key, n_a, n_b, m_a AS mean_a, m_b AS mean_b,
       (m_a - m_b) / sqrt(v_a / n_a + v_b / n_b) AS t_stat,
       pow(v_a / n_a + v_b / n_b, 2)
           / (pow(v_a / n_a, 2) / (n_a - 1)
              + pow(v_b / n_b, 2) / (n_b - 1)) AS welch_df
FROM g
WHERE n_a >= 2 AND n_b >= 2 AND (v_a / n_a + v_b / n_b) > 0
ORDER BY key
"""


def _run_welch(df: pd.DataFrame, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(5)
    out = welch_t_ab(
        ds, key_col="key", value_col="value", id_col="id", **kw
    ).to_pandas()
    return out.sort_values("key").reset_index(drop=True)


def _ref_welch(df: pd.DataFrame, where_extra: str = "") -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(_welch_sql(where_extra)).df()


def _assert_welch_match(out: pd.DataFrame, ref: pd.DataFrame):
    assert len(out) == len(ref)
    assert list(out["key"]) == list(ref["key"])
    for c in ("n_a", "n_b"):
        np.testing.assert_array_equal(out[c].to_numpy(), ref[c].to_numpy())
    for c in ("mean_a", "mean_b", "t_stat", "welch_df"):
        np.testing.assert_allclose(
            np.round(out[c].to_numpy(), 6),
            np.round(ref[c].to_numpy(), 6),
            atol=1.5e-6,
            rtol=0,
            err_msg=c,
        )


def test_welch_large_offset_no_cancellation(ray_session):
    # the rolling_zscore lesson: a large common offset must NOT cancel.
    # At offset 1e6 / std 1 the NAIVE (s2 - s1^2/n) form loses ~4
    # digits (mean^2/var = 1e12); the min-shift keeps round-6 parity
    # with var_samp.  (1e8 / std 1e-3 is out of reach for ANY kernel:
    # there the twin's own avg() difference is quantized past round-6.)
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": np.repeat(["a", "b"], n // 2),
            "value": 1e6 + rng.normal(0.0, 1.0, n),
        }
    )
    out = _run_welch(df)
    ref = _ref_welch(df)
    _assert_welch_match(out, ref)
    # sanity: the t statistic is O(1), not collapsed to ~0
    assert np.all(np.abs(ref["t_stat"]) < 10)
    assert np.all(ref["welch_df"] > 100)


def test_welch_null_parity_and_one_armed_keys(ray_session):
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            "id": pd.array(np.arange(n, dtype=np.int64), dtype="Int64"),
            "key": rng.choice(["x", "y", "z"], n),
            "value": rng.normal(50.0, 30.0, n),
        }
    )
    df.loc[5, "key"] = None
    df.loc[7, "id"] = pd.NA
    df.loc[9, "value"] = np.nan
    df.loc[11, "value"] = None
    # a key with rows in only one arm must be absent: give "solo" two
    # rows whose lehmer parity is even (arm a) -- ids found by search
    from light_curve_feature_ray.pipelines.sampling import lehmer_hash

    ids = np.arange(100000, 100600, dtype=np.int64)
    even = ids[lehmer_hash(ids) % 2 == 0][:3]
    solo = pd.DataFrame(
        {
            "id": pd.array(even, dtype="Int64"),
            "key": "solo",
            "value": [1.0, 2.0, 3.0],
        }
    )
    df = pd.concat([df, solo], ignore_index=True)
    out = _run_welch(df)
    ref = _ref_welch(df)
    assert "solo" not in set(out["key"])
    _assert_welch_match(out, ref)


def test_welch_parallelism_invariance(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.choice(list("abcdef"), n),
            "value": rng.normal(0.0, 30.0, n),
        }
    )
    outs = []
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        o = (
            welch_t_ab(ds, key_col="key", value_col="value", id_col="id")
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )
        outs.append(o)
    a, b = outs
    np.testing.assert_array_equal(a["key"], b["key"])
    for c in ("n_a", "n_b"):
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())
    for c in ("mean_a", "mean_b", "t_stat", "welch_df"):
        np.testing.assert_allclose(
            np.round(a[c].to_numpy(), 6),
            np.round(b[c].to_numpy(), 6),
            atol=1e-6,
            rtol=0,
        )


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


HEADER = "site nav about contact"
FOOTER = "copyright 2026 all rights reserved"


def _docs() -> pd.DataFrame:
    rows = []
    for i in range(8):
        body = f"unique body text for document {i} with extra words {i * 7}"
        rows.append((i, f"{HEADER}\n{body}\n{FOOTER}"))
    rows.append((100, f"{HEADER}\n{FOOTER}"))  # all lines common -> dropped
    rows.append((101, "a single unshared line"))
    rows.append((102, None))  # null text -> absent
    rows.append((103, f"first unique line\n\nlast unique line"))  # empty line
    rows.append((104, f"another one\n\nmore text here"))  # shares only ""
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_line_dedup_newline_mode_planted(ray_session):
    df = _docs()
    out = (
        line_dedup(rd.from_pandas(df).repartition(4), min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    ref = con.execute(
        """
WITH l AS (
    SELECT doc_id,
           unnest(string_split(text, chr(10))) AS line,
           unnest(generate_series(1, len(string_split(text, chr(10)))))
               AS ln
    FROM documents WHERE text IS NOT NULL
), f AS (
    SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line
), kept AS (
    SELECT l.doc_id, l.ln, l.line
    FROM l JOIN f USING (line) WHERE f.df < 2
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS text_clean,
       count(*) AS n_lines_kept
FROM kept GROUP BY doc_id ORDER BY doc_id
"""
    ).df()
    assert list(out["doc_id"]) == list(ref["doc_id"])
    assert list(out["text_clean"]) == list(ref["text_clean"])
    np.testing.assert_array_equal(
        out["n_lines_kept"].to_numpy(), ref["n_lines_kept"].to_numpy()
    )
    # semantics spot-checks
    ids = set(out["doc_id"])
    assert 100 not in ids  # every line common
    assert 102 not in ids  # null text
    assert 101 in ids and out.set_index("doc_id").loc[101, "text_clean"] == (
        "a single unshared line"
    )
    body0 = out.set_index("doc_id").loc[0, "text_clean"]
    assert HEADER not in body0 and FOOTER not in body0
    # the empty line is shared by docs 103/104 -> removed from both
    assert out.set_index("doc_id").loc[103, "text_clean"] == (
        "first unique line\nlast unique line"
    )


def test_line_dedup_parallelism_invariance_and_min_docs(ray_session):
    df = _docs().dropna(subset=["text"])
    outs = []
    for parts in (1, 6):
        o = (
            line_dedup(rd.from_pandas(df).repartition(parts), min_docs=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # min_docs=3: header/footer still common (8 docs), the "" line only
    # appears in 2 docs -> kept now
    got = outs[0].set_index("doc_id")
    assert got.loc[103, "text_clean"] == "first unique line\n\nlast unique line"


def test_line_dedup_rejects_bad_params(ray_session):
    df = _docs()
    with pytest.raises(ValueError):
        line_dedup(rd.from_pandas(df), min_docs=0)
    with pytest.raises(ValueError):
        line_dedup(rd.from_pandas(df), line_tokens=0)


def test_line_dedup_pseudo_line_token_mode(ray_session):
    # 10-token pseudo-lines: two docs share their first 10 tokens
    shared = " ".join(f"tok{i}" for i in range(10))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                shared + " tail one extra words here now alpha beta gamma",
                shared + " different tail entirely with other words x y",
                "completely unrelated words " + " ".join("w%d" % i for i in range(9)),
            ],
        }
    )
    out = (
        line_dedup(
            rd.from_pandas(df).repartition(2), line_tokens=10, min_docs=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = out.set_index("doc_id")
    assert shared not in got.loc[1, "text_clean"]
    assert shared not in got.loc[2, "text_clean"]
    # doc 3 (12 tokens) re-chunks into a 10-token line + a 2-token
    # tail; neither is shared, so both survive, newline-joined
    t3 = df.set_index("doc_id").loc[3, "text"].split(" ")
    assert got.loc[3, "text_clean"] == (
        " ".join(t3[:10]) + "\n" + " ".join(t3[10:])
    )
    assert got.loc[3, "n_lines_kept"] == 2


# ---------------------------------------------------------------------------
# rolling_median
# ---------------------------------------------------------------------------


from light_curve_feature_ray.pipelines.windows import (  # noqa: E402
    event_path_ngrams,
    rolling_median,
)


def _events_with_nulls() -> pd.DataFrame:
    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_100_000, n), unit="s"
            ),
            "value": rng.normal(0.0, 30.0, n),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    # duplicate timestamps within a user (id tie-break), NaN values,
    # null ts
    df.loc[10, "ts"] = df.loc[11, "ts"]
    df.loc[[20, 21, 22], "value"] = np.nan
    df.loc[30, "ts"] = pd.NaT
    return df


def test_rolling_median_matches_duckdb_with_nulls(ray_session):
    df = _events_with_nulls()
    out = (
        rolling_median(
            rd.from_pandas(df).repartition(4), k=4, num_partitions=8
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(
        """
SELECT event_id, user_id, epoch_us(ts) AS t_us,
       count(value) OVER w AS rolling_n,
       median(value) OVER w AS rolling_median
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""
    ).df()
    assert len(out) == len(ref)
    np.testing.assert_array_equal(
        out["event_id"].to_numpy(), ref["event_id"].to_numpy()
    )
    np.testing.assert_array_equal(
        out["rolling_n"].to_numpy(), ref["rolling_n"].to_numpy()
    )
    a = out["rolling_median"].to_numpy()
    b = ref["rolling_median"].to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    np.testing.assert_array_equal(a[~both_nan], b[~both_nan])
    assert np.isnan(a).sum() == np.isnan(b).sum()
    # the NaN-valued rows themselves still emit (their windows may be
    # empty -> NULL median); null-ts row 30 is absent
    assert 30 not in set(out["event_id"])


def test_rolling_median_parallelism_invariance(ray_session):
    df = _events_with_nulls().dropna(subset=["ts"])
    outs = []
    for parts, nparts in ((1, 3), (6, 11)):
        o = (
            rolling_median(
                rd.from_pandas(df).repartition(parts),
                k=5,
                num_partitions=nparts,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_rolling_median_even_window_interpolates(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 7],
            "ts": pd.to_datetime([1, 2, 3, 4], unit="s"),
            "value": [1.0, 3.0, 10.0, 20.0],
        }
    )
    out = (
        rolling_median(rd.from_pandas(df), k=2, num_partitions=2)
        .to_pandas()
        .sort_values("event_id")
    )
    np.testing.assert_allclose(
        out["rolling_median"].to_numpy(), [1.0, 2.0, 6.5, 15.0]
    )


# ---------------------------------------------------------------------------
# event_path_ngrams
# ---------------------------------------------------------------------------


def test_event_paths_matches_duckdb_and_null_adjacency(ray_session):
    df = _events_with_nulls()
    # plant a null type in the middle of a run: neighbours must join
    df.loc[50, "event_type"] = None
    out = event_path_ngrams(
        rd.from_pandas(df).repartition(4), n=3, top=25, num_partitions=8
    ).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(
        """
WITH e AS (
    SELECT user_id, ts, event_id, event_type FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
      AND event_type IS NOT NULL
), w AS (
    SELECT event_type AS a,
           lead(event_type, 1) OVER win AS b,
           lead(event_type, 2) OVER win AS c
    FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
    SELECT a || '>' || b || '>' || c AS path, count(*) AS cnt
    FROM w WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1
)
SELECT path, cnt FROM g ORDER BY cnt DESC, path ASC LIMIT 25
"""
    ).df()
    assert list(out["path"]) == list(ref["path"])
    np.testing.assert_array_equal(out["cnt"].to_numpy(), ref["cnt"].to_numpy())


def test_event_paths_partition_invariance_and_order(ray_session):
    df = _events_with_nulls()
    outs = []
    for parts, nparts in ((1, 2), (7, 13)):
        o = event_path_ngrams(
            rd.from_pandas(df).repartition(parts),
            n=2,
            top=10,
            num_partitions=nparts,
        ).to_pandas()
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    c = outs[0]["cnt"].to_numpy()
    assert (np.diff(c) <= 0).all()  # cnt DESC
    # ties ordered path ASC
    p = outs[0]["path"].to_numpy()
    for i in range(len(c) - 1):
        if c[i] == c[i + 1]:
            assert p[i] < p[i + 1]


def test_event_paths_rejects_bad_params(ray_session):
    df = _events_with_nulls()
    with pytest.raises(ValueError):
        event_path_ngrams(rd.from_pandas(df), n=1)
    with pytest.raises(ValueError):
        event_path_ngrams(rd.from_pandas(df), top=0)


# ---------------------------------------------------------------------------
# lag_autocorr / target_encode
# ---------------------------------------------------------------------------


from light_curve_feature_ray.pipelines.aggregates import (  # noqa: E402
    target_encode,
)
from light_curve_feature_ray.pipelines.windows import (  # noqa: E402
    lag_autocorr,
)


def test_lag_autocorr_null_parity_and_dropped_middle(ray_session):
    df = _events_with_nulls()
    # a dropped (NaN-value) middle row must JOIN its neighbours
    df.loc[40, "value"] = np.nan
    out = (
        lag_autocorr(
            rd.from_pandas(df).repartition(4), lag=1, num_partitions=8
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(
        """
WITH e AS (
    SELECT user_id, ts, event_id, value FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(value)
), p AS (
    SELECT user_id, value AS a,
           lead(value, 1) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS b
    FROM e
)
SELECT user_id, count(*) AS n_pairs, corr(a, b) AS autocorr
FROM p WHERE b IS NOT NULL GROUP BY user_id
HAVING corr(a, b) IS NOT NULL
ORDER BY user_id
"""
    ).df()
    assert len(out) == len(ref)
    np.testing.assert_array_equal(
        out["user_id"].to_numpy(), ref["user_id"].to_numpy()
    )
    np.testing.assert_array_equal(
        out["n_pairs"].to_numpy(), ref["n_pairs"].to_numpy()
    )
    np.testing.assert_allclose(
        out["autocorr"].to_numpy(), ref["autocorr"].to_numpy(), atol=5e-7
    )


def test_lag_autocorr_large_offset_and_constant_key(ray_session):
    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.repeat([1, 2, 3], n // 3),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "value": 1e6 + rng.normal(0.0, 1.0, n),
        }
    )
    # key 3 constant -> zero variance -> absent (corr NULL in SQL)
    df.loc[df["user_id"] == 3, "value"] = 42.0
    # key 1: strong positive serial dependence
    v = df.loc[df["user_id"] == 1, "value"].to_numpy()
    df.loc[df["user_id"] == 1, "value"] = 1e6 + np.cumsum(
        rng.normal(0, 0.1, v.size)
    )
    out = (
        lag_autocorr(rd.from_pandas(df).repartition(3), lag=1)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert set(out["user_id"]) == {1, 2}
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(
        """
WITH p AS (
    SELECT user_id, value AS a,
           lead(value, 1) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS b
    FROM events
)
SELECT user_id, corr(a, b) AS autocorr FROM p WHERE b IS NOT NULL
GROUP BY user_id HAVING corr(a, b) IS NOT NULL ORDER BY user_id
"""
    ).df()
    np.testing.assert_allclose(
        np.round(out["autocorr"].to_numpy(), 6),
        np.round(ref["autocorr"].to_numpy(), 6),
        atol=1.5e-6,
    )
    assert out.set_index("user_id").loc[1, "autocorr"] > 0.8


def test_lag_autocorr_lag2_and_partition_invariance(ray_session):
    df = _events_with_nulls()
    outs = []
    for parts, nparts in ((1, 2), (5, 9)):
        o = (
            lag_autocorr(
                rd.from_pandas(df).repartition(parts),
                lag=2,
                num_partitions=nparts,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    with pytest.raises(ValueError):
        lag_autocorr(rd.from_pandas(df), lag=0)


def test_target_encode_null_parity_and_prior_fallback(ray_session):
    df = _events_with_nulls()
    df.loc[60, "event_type"] = None  # null key -> prior
    df.loc[61, "value"] = np.nan  # own target NaN -> still encoded
    out = (
        target_encode(
            rd.from_pandas(df).repartition(4),
            key_col="event_type",
            target_col="value",
            smoothing=5.0,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(
        """
WITH v AS (
    SELECT event_type, value FROM events
    WHERE event_type IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(value)
), g AS (
    SELECT event_type, count(*) AS n, avg(value) AS m
    FROM v GROUP BY event_type
), p AS (SELECT avg(value) AS prior FROM v)
SELECT e.event_id, e.event_type,
       coalesce((g.n * g.m + 5.0 * p.prior) / (g.n + 5.0), p.prior) AS te
FROM events e LEFT JOIN g USING (event_type) CROSS JOIN p
ORDER BY e.event_id
"""
    ).df()
    assert len(out) == len(ref) == len(df)
    np.testing.assert_allclose(
        out["te"].to_numpy(), ref["te"].to_numpy(), atol=5e-7
    )
    # null-key row got exactly the prior
    prior = con.execute(
        """SELECT avg(value) FROM events WHERE event_type IS NOT NULL
           AND value IS NOT NULL AND NOT isnan(value)"""
    ).fetchone()[0]
    got = out.set_index("event_id").loc[60, "te"]
    assert abs(got - prior) < 1e-9


def test_target_encode_shrinks_small_categories(ray_session):
    df = pd.DataFrame(
        {
            "event_id": np.arange(103, dtype=np.int64),
            "event_type": ["big"] * 100 + ["small"] * 3,
            "value": [10.0] * 100 + [100.0] * 3,
        }
    )
    out = target_encode(
        rd.from_pandas(df).repartition(3), smoothing=10.0
    ).to_pandas()
    got = out.drop_duplicates("event_type").set_index("event_type")["te"]
    prior = (100 * 10.0 + 3 * 100.0) / 103
    # big ~ its own mean, small pulled hard toward the prior
    assert abs(got["big"] - 10.0) < abs(got["small"] - 100.0)
    exp_small = (3 * 100.0 + 10.0 * prior) / 13.0
    np.testing.assert_allclose(got["small"], exp_small, atol=1e-9)
    with pytest.raises(ValueError):
        target_encode(rd.from_pandas(df), smoothing=-1.0)


def test_target_encode_parallelism_invariance(ray_session):
    df = _events_with_nulls()
    outs = []
    for parts in (1, 6):
        o = (
            target_encode(rd.from_pandas(df).repartition(parts))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        outs.append(o)
    np.testing.assert_allclose(
        np.round(outs[0]["te"].to_numpy(), 6),
        np.round(outs[1]["te"].to_numpy(), 6),
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# validate_constraints
# ---------------------------------------------------------------------------


from light_curve_feature_ray.pipelines.quality import (  # noqa: E402
    validate_constraints,
)


def _quality_df() -> pd.DataFrame:
    df = pd.DataFrame(
        {
            "event_id": pd.array(
                np.arange(20, dtype=np.int64), dtype="Int64"
            ),
            "user_id": pd.array(
                [1, 2, 3, 4, 5, 1, 2, 3, 4, 5] * 2, dtype="Int64"
            ),
            "event_type": ["click", "view"] * 10,
            "value": np.linspace(-5.0, 120.0, 20),
        }
    )
    df.loc[3, "user_id"] = pd.NA
    df.loc[4, "value"] = np.nan
    df.loc[5, "value"] = None
    df.loc[6, "event_type"] = "WEIRD"
    df.loc[7, "event_type"] = None
    return df


def test_validate_constraints_all_kinds_vs_duckdb(ray_session):
    df = _quality_df()
    rules = [
        {"name": "u_nn", "kind": "not_null", "col": "user_id"},
        {
            "name": "v_range",
            "kind": "range",
            "col": "value",
            "lo": 0.0,
            "hi": 100.0,
        },
        {
            "name": "t_lower",
            "kind": "regex",
            "col": "event_type",
            "pattern": "^[a-z]+$",
        },
        {
            "name": "t_set",
            "kind": "in_set",
            "col": "event_type",
            "values": ["click", "view"],
        },
        {"name": "id_uq", "kind": "unique", "col": "event_id"},
        {"name": "user_uq", "kind": "unique", "col": "user_id"},
    ]
    out = (
        validate_constraints(
            rd.from_pandas(df).repartition(4), rules=rules
        )
        .to_pandas()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(
        """
SELECT 'u_nn' AS rule, count(*) AS n_checked,
       count(*) FILTER (user_id IS NULL) AS n_violations,
       min(event_id) FILTER (user_id IS NULL) AS min_violating_id
FROM events
UNION ALL
SELECT 'v_range', count(*) FILTER (value IS NOT NULL AND NOT isnan(value)),
       count(*) FILTER (value IS NOT NULL AND NOT isnan(value)
                        AND (value < 0.0 OR value > 100.0)),
       min(event_id) FILTER (value IS NOT NULL AND NOT isnan(value)
                             AND (value < 0.0 OR value > 100.0))
FROM events
UNION ALL
SELECT 't_lower', count(*) FILTER (event_type IS NOT NULL),
       count(*) FILTER (event_type IS NOT NULL
                        AND NOT regexp_matches(event_type, '^[a-z]+$')),
       min(event_id) FILTER (event_type IS NOT NULL
                             AND NOT regexp_matches(event_type, '^[a-z]+$'))
FROM events
UNION ALL
SELECT 't_set', count(*) FILTER (event_type IS NOT NULL),
       count(*) FILTER (event_type IS NOT NULL
                        AND event_type NOT IN ('click', 'view')),
       min(event_id) FILTER (event_type IS NOT NULL
                             AND event_type NOT IN ('click', 'view'))
FROM events
UNION ALL
SELECT 'id_uq', count(event_id), count(event_id) - count(DISTINCT event_id),
       (SELECT min(e2.event_id) FROM events e2 WHERE e2.event_id IN
          (SELECT event_id FROM events WHERE event_id IS NOT NULL
           GROUP BY event_id HAVING count(*) > 1))
FROM events
UNION ALL
SELECT 'user_uq', count(user_id), count(user_id) - count(DISTINCT user_id),
       (SELECT min(e2.event_id) FROM events e2 WHERE e2.user_id IN
          (SELECT user_id FROM events WHERE user_id IS NOT NULL
           GROUP BY user_id HAVING count(*) > 1))
FROM events
ORDER BY rule
"""
    ).df()
    assert list(out["rule"]) == list(ref["rule"])
    np.testing.assert_array_equal(
        out["n_checked"].to_numpy(), ref["n_checked"].to_numpy()
    )
    np.testing.assert_array_equal(
        out["n_violations"].to_numpy(), ref["n_violations"].to_numpy()
    )
    a = out["min_violating_id"].astype("float64").to_numpy()
    b = ref["min_violating_id"].astype("float64").to_numpy()
    nn = ~(np.isnan(a) & np.isnan(b))
    np.testing.assert_array_equal(a[nn], b[nn])
    # spot semantics: value range violations exist, regex catches WEIRD
    got = out.set_index("rule")
    assert got.loc["v_range", "n_violations"] > 0
    assert got.loc["t_lower", "n_violations"] == 1
    assert got.loc["id_uq", "n_violations"] == 0
    assert pd.isna(got.loc["id_uq", "min_violating_id"])


def test_validate_constraints_partition_invariance_and_params(ray_session):
    df = _quality_df()
    rules = [
        {"name": "u_uq", "kind": "unique", "col": "user_id"},
        {
            "name": "v",
            "kind": "range",
            "col": "value",
            "lo": 0.0,
            "hi": 50.0,
        },
    ]
    outs = []
    for parts in (1, 7):
        o = (
            validate_constraints(
                rd.from_pandas(df).repartition(parts), rules=rules
            )
            .to_pandas()
            .sort_values("rule")
            .reset_index(drop=True)
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for bad in (
        [],
        [{"name": "x", "kind": "nope", "col": "value"}],
        [{"name": "", "kind": "not_null", "col": "value"}],
        [
            {"name": "a", "kind": "not_null", "col": "value"},
            {"name": "a", "kind": "not_null", "col": "user_id"},
        ],
        [{"name": "r", "kind": "range", "col": "value", "lo": 0.0}],
        [{"name": "g", "kind": "regex", "col": "event_type"}],
        [{"name": "s", "kind": "in_set", "col": "event_type", "values": []}],
    ):
        with pytest.raises(ValueError):
            validate_constraints(rd.from_pandas(df), rules=bad)


# ---------------------------------------------------------------------------
# keyword_hits / changepoint_single
# ---------------------------------------------------------------------------


from light_curve_feature_ray.pipelines.text import keyword_hits  # noqa: E402
from light_curve_feature_ray.pipelines.windows import (  # noqa: E402
    changepoint_single,
)


def test_keyword_hits_counts_and_null_text(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "aba abab caba",  # 'ab' non-overlapping: aba->1, abab->2
                "no hits here",
                None,
                "ab ab ab",
            ],
        }
    )
    out = (
        keyword_hits(
            rd.from_pandas(df).repartition(3), keywords=["ab", "caba"]
        )
        .to_pandas()
        .sort_values(["doc_id", "keyword"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    ref = con.execute(
        """
WITH k(kw) AS (VALUES ('ab'), ('caba')),
h AS (
    SELECT doc_id, kw,
           (len(text) - len(replace(text, kw, ''))) // len(kw) AS hits
    FROM documents, k WHERE text IS NOT NULL
)
SELECT doc_id, kw AS keyword, hits FROM h WHERE hits > 0
ORDER BY doc_id, keyword
"""
    ).df()
    assert list(out["doc_id"]) == list(ref["doc_id"])
    assert list(out["keyword"]) == list(ref["keyword"])
    np.testing.assert_array_equal(
        out["hits"].to_numpy(), ref["hits"].to_numpy()
    )
    got = out.set_index(["doc_id", "keyword"])["hits"]
    assert got.loc[(1, "ab")] == 4  # aba=1 + abab=2 + caba=1
    assert got.loc[(4, "ab")] == 3
    assert 2 not in out["doc_id"].values and 3 not in out["doc_id"].values
    with pytest.raises(ValueError):
        keyword_hits(rd.from_pandas(df), keywords=[])
    with pytest.raises(ValueError):
        keyword_hits(rd.from_pandas(df), keywords=["ok", ""])


def test_changepoint_recovers_planted_shift(ray_session):
    rng = np.random.default_rng(21)
    rows = []
    eid = 0
    for uid, split_at, n in ((1, 30, 80), (2, 10, 40), (3, 55, 60)):
        for j in range(n):
            level = 0.0 if j < split_at else 25.0
            rows.append(
                (eid, uid, 1_700_000_000 + j, level + rng.normal(0, 1.0))
            )
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    out = (
        changepoint_single(rd.from_pandas(df).repartition(4), min_n=4)
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1, "split_idx"] == 30
    assert out.loc[2, "split_idx"] == 10
    assert out.loc[3, "split_idx"] == 55
    assert (out["gain"] > 0).all()
    # gain dominates noise: the planted shift explains most variance
    assert (out["gain"] / out["sse_total"] > 0.9).all()


def test_changepoint_null_parity_vs_duckdb(ray_session):
    df = _events_with_nulls()
    out = (
        changepoint_single(
            rd.from_pandas(df).repartition(4), min_n=4, num_partitions=8
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(
        """
WITH e AS (
    SELECT user_id, ts, event_id, value FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(value)
), o AS (
    SELECT user_id, epoch_us(ts) AS t_us,
           value - first_value(value) OVER w AS vs,
           row_number() OVER w AS i,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), c AS (
    SELECT user_id, i, n, t_us,
           sum(vs) OVER w2 AS s_i, sum(vs * vs) OVER w2 AS s2_i,
           sum(vs) OVER (PARTITION BY user_id) AS s_n,
           sum(vs * vs) OVER (PARTITION BY user_id) AS s2_n
    FROM o WINDOW w2 AS (PARTITION BY user_id ORDER BY i
                         ROWS UNBOUNDED PRECEDING)
), s AS (
    SELECT user_id, i, n, t_us,
           (s2_i - s_i * s_i / i)
               + ((s2_n - s2_i)
                  - (s_n - s_i) * (s_n - s_i) / (n - i)) AS sse,
           s2_n - s_n * s_n / n AS sse_total
    FROM c WHERE i < n
), r AS (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY round(sse, 6) ASC, i ASC) AS rk
    FROM s
)
SELECT user_id, n, i AS split_idx, t_us AS split_t_us,
       sse_total, sse AS sse_split FROM r WHERE rk = 1 AND n >= 4
ORDER BY user_id
"""
    ).df()
    assert len(out) == len(ref)
    for c in ("user_id", "n", "split_idx", "split_t_us"):
        np.testing.assert_array_equal(
            out[c].to_numpy(), ref[c].to_numpy(), err_msg=c
        )
    for c in ("sse_total", "sse_split"):
        np.testing.assert_allclose(
            out[c].to_numpy(), ref[c].to_numpy(), atol=5e-7, err_msg=c
        )


def test_changepoint_partition_invariance_and_min_n(ray_session):
    df = _events_with_nulls()
    outs = []
    for parts, nparts in ((1, 2), (6, 9)):
        o = (
            changepoint_single(
                rd.from_pandas(df).repartition(parts),
                min_n=6,
                num_partitions=nparts,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["n"] >= 6).all()
    with pytest.raises(ValueError):
        changepoint_single(rd.from_pandas(df), min_n=1)
