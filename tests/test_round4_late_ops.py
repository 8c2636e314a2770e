"""Round-4 late operators: retention cohorts, per-key top-k values,
global percent_rank/cume_dist, PMI bigram collocations.

Contracts pinned here (the driver testdata can't exercise them):
- null keys / timestamps / values / texts follow each operator's
  documented drop rule, verified against the ACTUAL oracle SQL from
  __ray_entry__ over synthetic null-bearing tables;
- outputs are invariant to block layout / partition count;
- group_top_k(k=1) coincides with group_mode (same tie rule).
"""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test_r4", "__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _round6(v):
    v = np.asarray(v, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(v) * 1e6 + 0.5) / 1e6, v)
    return np.where(np.isnan(v), np.nan, out)


@pytest.fixture(scope="module")
def null_events_r4():
    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 8, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase", "refund"], size=n
            ),
            "value": rng.normal(scale=30, size=n),
        }
    )
    df["ts"] = pd.to_datetime(
        rng.integers(0, 40 * 86_400_000_000, size=n), unit="us"
    )
    # nulls: key, ts, type, value — each operator documents its drop rule
    df["user_id"] = df["user_id"].astype("Int64")
    df.loc[df.index % 11 == 0, "user_id"] = pd.NA
    df.loc[df.index % 13 == 0, "ts"] = pd.NaT
    df.loc[df.index % 17 == 0, "event_type"] = None
    df.loc[df.index % 19 == 0, "value"] = np.nan
    return df


def test_retention_cohorts_null_parity(ray_session, entry_mod, null_events_r4):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import retention_cohorts

    got = (
        retention_cohorts(
            rd.from_pandas(null_events_r4[["user_id", "ts"]]),
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["cohort", "offset_periods"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_r4)
    want = (
        con.execute(entry_mod.SQL_EVENTS_RETENTION)
        .df()
        .sort_values(["cohort", "offset_periods"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert list(got["offset_periods"]) == list(want["offset_periods"])
    assert list(got["n_users"]) == list(want["n_users"])
    assert (
        got["cohort"].astype("datetime64[us]")
        == want["cohort"].astype("datetime64[us]")
    ).all()
    # every key contributes its offset-0 cell: cohort totals = distinct keys
    zero = got[got["offset_periods"] == 0]
    n_keys = null_events_r4.dropna(subset=["user_id", "ts"])["user_id"].nunique()
    assert int(zero["n_users"].sum()) == n_keys


def test_retention_cohorts_partition_invariance(ray_session, null_events_r4):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import retention_cohorts

    outs = []
    for parts, blocks in ((3, 1), (11, 7)):
        ds = rd.from_pandas(null_events_r4[["user_id", "ts"]]).repartition(
            blocks
        )
        outs.append(
            retention_cohorts(ds, num_partitions=parts)
            .to_pandas()
            .sort_values(["cohort", "offset_periods"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_group_top_k_null_parity_and_mode_consistency(
    ray_session, entry_mod, null_events_r4
):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.aggregates import (
        group_mode,
        group_top_k,
    )

    src = null_events_r4[["user_id", "event_type"]]
    got = (
        group_top_k(
            rd.from_pandas(src),
            key_col="user_id",
            value_col="event_type",
            k=2,
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["user_id", "rk"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_r4)
    want = (
        con.execute(entry_mod.SQL_EVENTS_TOP_TYPES)
        .df()
        .sort_values(["user_id", "rk"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("user_id", "event_type", "cnt", "rk"):
        assert list(got[c]) == list(want[c]), c
    # k=1 coincides with group_mode's pick (same (cnt DESC, value ASC) tie)
    top1 = (
        group_top_k(
            rd.from_pandas(src),
            key_col="user_id",
            value_col="event_type",
            k=1,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    mode = (
        group_mode(
            rd.from_pandas(src), key_col="user_id", value_col="event_type"
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(top1["event_type"]) == list(mode["mode_value"])
    assert list(top1["cnt"]) == list(mode["mode_count"])


def test_percent_rank_null_parity(ray_session, entry_mod, null_events_r4):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.scan import percent_rank_rows

    got = (
        percent_rank_rows(
            rd.from_pandas(null_events_r4[["event_id", "value"]]),
            order_cols=["value"],
            id_col="event_id",
            num_buckets=13,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_r4)
    want = (
        con.execute(entry_mod.SQL_EVENTS_PERCENT_RANK)
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == len(null_events_r4)
    # NULL values rank LAST and are peers on both sides
    assert list(got["rnk"]) == list(want["rnk"])
    np.testing.assert_allclose(
        _round6(got["percent_rank"]), want["percent_rank"], atol=1e-12
    )
    np.testing.assert_allclose(
        _round6(got["cume_dist"]), want["cume_dist"], atol=1e-12
    )


def test_percent_rank_bucket_invariance_and_edges(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.scan import percent_rank_rows

    # heavy ties + negative zero (must tie with +0.0, the SQL comparison)
    df = pd.DataFrame(
        {
            "event_id": np.arange(12, dtype=np.int64),
            "value": np.array(
                [1.0, 1.0, 1.0, -0.0, 0.0, 2.5, -3.0, -3.0, 2.5, 1.0, 7.0, -0.0]
            ),
        }
    )
    outs = []
    for buckets, blocks in ((2, 1), (64, 5)):
        outs.append(
            percent_rank_rows(
                rd.from_pandas(df).repartition(blocks),
                order_cols=["value"],
                id_col="event_id",
                num_buckets=buckets,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0].set_index("event_id")
    assert got.loc[6, "rnk"] == got.loc[7, "rnk"] == 1
    assert got.loc[3, "rnk"] == got.loc[4, "rnk"] == got.loc[11, "rnk"] == 3
    assert got.loc[10, "rnk"] == 12 and got.loc[10, "cume_dist"] == 1.0
    # single row: percent_rank defined as 0
    one = (
        percent_rank_rows(
            rd.from_pandas(df.head(1)),
            order_cols=["value"],
            id_col="event_id",
        )
        .to_pandas()
    )
    assert one["rnk"].iloc[0] == 1 and one["percent_rank"].iloc[0] == 0.0


def test_pmi_bigrams_oracle_parity_and_edges(ray_session, entry_mod):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import pmi_bigrams

    rng = np.random.default_rng(23)
    # a corpus with real collocations + null/empty/one-token docs
    phrases = [
        "new york city hall",
        "machine learning models train fast",
        "the quick brown fox",
        "san francisco bay area",
    ]
    texts = [phrases[i % 4] for i in range(120)]
    texts += ["", None, "single", "a b", "yo"]
    rng.shuffle(texts)
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = (
        pmi_bigrams(
            rd.from_pandas(docs[["text"]]).repartition(4),
            k=entry_mod.PMI_K,
            min_count=entry_mod.PMI_MIN_COUNT,
        )
        .to_pandas()
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(entry_mod.SQL_DOC_PMI_BIGRAMS)
        .df()
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("term_a", "term_b", "cnt"):
        assert list(got[c]) == list(want[c]), c
    np.testing.assert_allclose(_round6(got["pmi"]), want["pmi"], atol=1e-12)
    # bigrams never span documents: "fox san" (adjacent docs) must be absent
    assert not (
        ((got["term_a"] == "fox") & (got["term_b"] == "san")).any()
    )


def test_event_transitions_null_parity(ray_session, entry_mod, null_events_r4):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import event_transitions

    got = (
        event_transitions(
            rd.from_pandas(
                null_events_r4[["event_id", "user_id", "ts", "event_type"]]
            ),
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", null_events_r4)
    want = (
        con.execute(entry_mod.SQL_EVENTS_TRANSITIONS)
        .df()
        .sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("from_state", "to_state", "cnt"):
        assert list(got[c]) == list(want[c]), c
    np.testing.assert_allclose(_round6(got["p"]), want["p"], atol=1e-12)
    # conditional rows sum to 1 within each from_state
    sums = got.groupby("from_state")["p"].sum()
    np.testing.assert_allclose(sums, 1.0, atol=1e-9)


def test_event_transitions_partition_invariance_and_order(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.windows import event_transitions

    # duplicate timestamps: order decided by event_id, not arrival
    df = pd.DataFrame(
        {
            "event_id": np.array([2, 1, 3, 10, 11], dtype=np.int64),
            "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "ts": pd.to_datetime([100, 100, 200, 50, 50], unit="s"),
            "event_type": ["b", "a", "c", "y", "x"],
        }
    )
    outs = []
    for parts, blocks in ((2, 1), (7, 5)):
        outs.append(
            event_transitions(
                rd.from_pandas(df).repartition(blocks), num_partitions=parts
            )
            .to_pandas()
            .sort_values(["from_state", "to_state"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pairs = set(zip(outs[0]["from_state"], outs[0]["to_state"]))
    # user 1: a->b (ts tie broken by id: 1 before 2), b->c;
    # user 2: y->x (id 10 before 11); never c->y (no cross-key adjacency)
    assert pairs == {("a", "b"), ("b", "c"), ("y", "x")}


def test_char_entropy_parity_and_edges(ray_session, entry_mod):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import char_entropy

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(7, dtype=np.int64),
            "text": [
                "aaaa",            # zero entropy
                "abab",            # 1 bit = ln 2
                "héllo wörld\n",   # non-ASCII + newline code points
                "",                # empty -> absent
                None,              # null -> absent
                "abcdefg",         # all distinct: ln 7
                "x",               # single char
            ],
        }
    )
    got = (
        char_entropy(rd.from_pandas(docs).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(entry_mod.SQL_DOC_CHAR_ENTROPY)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"]) == [0, 1, 2, 5, 6]
    for c in ("n_chars", "distinct_chars"):
        assert list(got[c]) == list(want[c]), c
    np.testing.assert_allclose(
        _round6(got["char_entropy"]), want["char_entropy"], atol=1e-12
    )
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "char_entropy"] == 0.0
    np.testing.assert_allclose(by_id.loc[1, "char_entropy"], np.log(2))
    np.testing.assert_allclose(by_id.loc[5, "char_entropy"], np.log(7))
    assert by_id.loc[2, "n_chars"] == 12 and by_id.loc[2, "distinct_chars"] == 10
