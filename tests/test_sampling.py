"""Deterministic sampling / curation operators (pipelines/sampling.py).

The contracts under test: (1) hash_sample keeps exactly the rows whose
Lehmer hash clears the threshold — independent of block layout; (2) lower
rates are strict subsets of higher rates (same seed); (3) stratified rates
apply per group; (4) top_k_per_group is exact (equals a pandas reference)
and invariant to partitioning, with deterministic tie-breaking.
"""

import numpy as np
import pandas as pd
import pytest

from light_curve_feature_ray.pipelines.sampling import (
    LEHMER_MOD,
    hash_sample,
    lehmer_hash,
    sample_threshold,
    stratified_hash_sample,
    top_k_per_group,
)


def _docs_df(n=400, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64) * 7 + 3,
            "lang": rng.choice(["en", "fr", "zh"], size=n, p=[0.5, 0.3, 0.2]),
            "score": rng.integers(0, 50, size=n).astype(np.int64),
        }
    )


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    return rd.from_pandas(_docs_df())


def test_lehmer_hash_range_and_determinism():
    ids = np.arange(10_000, dtype=np.int64)
    h = lehmer_hash(ids, seed=3)
    assert h.min() >= 0 and h.max() < LEHMER_MOD
    assert np.array_equal(h, lehmer_hash(ids, seed=3))
    assert not np.array_equal(h, lehmer_hash(ids, seed=4))
    # roughly uniform: a 30% threshold keeps ~30%
    frac = (h < sample_threshold(0.3)).mean()
    assert 0.25 < frac < 0.35


def test_hash_sample_matches_reference_and_layout_invariant(docs):
    df = _docs_df()
    expect = set(
        df.loc[lehmer_hash(df["doc_id"].to_numpy(), seed=9) < sample_threshold(0.4), "doc_id"]
    )
    for parts in (1, 7):
        got = hash_sample(
            docs.repartition(parts), rate=0.4, seed=9, id_col="doc_id"
        ).to_pandas()
        assert set(got["doc_id"]) == expect
        # emitted hash column audits the decision
        assert (got["sample_h"] < sample_threshold(0.4)).all()


def test_hash_sample_rate_nesting(docs):
    keep_10 = set(hash_sample(docs, 0.1, seed=1).to_pandas()["doc_id"])
    keep_30 = set(hash_sample(docs, 0.3, seed=1).to_pandas()["doc_id"])
    assert keep_10 <= keep_30
    assert hash_sample(docs, 0.0, seed=1).count() == 0
    assert hash_sample(docs, 1.0, seed=1, hash_col=None).count() == len(_docs_df())


def test_hash_sample_bad_rate():
    with pytest.raises(ValueError):
        sample_threshold(1.5)


def test_stratified_rates_apply_per_group(docs):
    df = _docs_df()
    rates = {"en": 0.8, "fr": 0.2}
    got = stratified_hash_sample(
        docs, rates=rates, group_col="lang", default_rate=0.05, seed=2
    ).to_pandas()
    h = lehmer_hash(df["doc_id"].to_numpy(), seed=2)
    thr = df["lang"].map(
        lambda g: sample_threshold(rates.get(g, 0.05))
    ).to_numpy()
    expect = set(df.loc[h < thr, "doc_id"])
    assert set(got["doc_id"]) == expect
    # per-group sanity: en keeps far more than zh
    frac = got.groupby("lang").size() / df.groupby("lang").size()
    assert frac["en"] > 0.6 and frac.get("zh", 0.0) < 0.2


def _topk_reference(df, k):
    out = (
        df.sort_values(["lang", "score", "doc_id"], ascending=[True, False, True])
        .groupby("lang")
        .head(k)
        .copy()
    )
    out["rk"] = out.groupby("lang").cumcount() + 1
    return out.reset_index(drop=True)


def test_top_k_per_group_exact_and_partition_invariant(docs):
    df = _docs_df()
    expect = _topk_reference(df, 5)
    for parts in (1, 3, 13):
        got = (
            top_k_per_group(
                docs.repartition(parts),
                group_col="lang",
                score_col="score",
                k=5,
                tiebreak_col="doc_id",
                num_partitions=6,
            )
            .to_pandas()
            .sort_values(["lang", "rk"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["lang", "score", "doc_id", "rk"]],
            expect[["lang", "score", "doc_id", "rk"]],
        )


def test_top_k_ties_resolve_by_tiebreak(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": [5, 1, 3, 2, 4],
            "lang": ["en"] * 5,
            "score": [7, 7, 7, 7, 7],
        }
    )
    got = top_k_per_group(
        rd.from_pandas(df).repartition(3),
        group_col="lang",
        score_col="score",
        k=3,
        tiebreak_col="doc_id",
        num_partitions=4,
    ).to_pandas()
    assert sorted(got["doc_id"]) == [1, 2, 3]
    assert list(got.sort_values("rk")["doc_id"]) == [1, 2, 3]


def test_top_k_larger_than_group(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": [1, 2], "lang": ["en", "fr"], "score": [1, 2]}
    )
    got = top_k_per_group(
        rd.from_pandas(df), "lang", "score", k=10, num_partitions=4
    ).to_pandas()
    assert len(got) == 2 and set(got["rk"]) == {1}


def test_hash_split_disjoint_complete_invariant(ray_session):
    import ray.data as rd
    import pandas as pd
    import numpy as np

    from light_curve_feature_ray.pipelines.sampling import hash_split

    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    outs = []
    for p in (1, 9):
        out = (
            hash_split(rd.from_pandas(df).repartition(p), splits, seed=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
        assert len(out) == 5000  # every row labeled exactly once
        frac = out["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.03
        assert abs(frac["val"] - 0.1) < 0.02
        assert abs(frac["test"] - 0.1) < 0.02
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hash_split_bad_fractions(ray_session):
    import ray.data as rd
    import pandas as pd
    import pytest

    from light_curve_feature_ray.pipelines.sampling import hash_split

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2]}))
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ds, {"a": 0.5, "b": 0.2})


def test_weighted_sample_matches_full_sort(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sampling import (
        LEHMER_MOD,
        lehmer_hash,
        weighted_sample,
    )

    rng = np.random.default_rng(43)
    n = 500
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_chars": rng.integers(1, 5000, size=n).astype(np.int64),
        }
    )
    # rows the operator must exclude
    df.loc[3, "n_chars"] = 0
    df.loc[7, "n_chars"] = -5
    k = 40
    got = weighted_sample(
        rd.from_pandas(df).repartition(7),
        k,
        weight_col="n_chars",
        seed=11,
    ).to_pandas()
    # naive: full E-S key sort
    ok = df[df["n_chars"] > 0].copy()
    h = lehmer_hash(ok["doc_id"].to_numpy(), seed=11)
    ok["es_key"] = np.log((h + 1.0) / float(LEHMER_MOD + 1)) / ok[
        "n_chars"
    ].astype(np.float64)
    want = ok.sort_values(
        ["es_key", "doc_id"], ascending=[False, True]
    ).head(k)
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(got["es_key"], want["es_key"], rtol=1e-12)
    assert not set(got["doc_id"]) & {3, 7}
    # layout invariance
    again = weighted_sample(
        rd.from_pandas(df).repartition(23), k, weight_col="n_chars", seed=11
    ).to_pandas()
    assert list(got["doc_id"]) == list(again["doc_id"])
    # k > n clamps; k <= 0 raises
    allr = weighted_sample(
        rd.from_pandas(df), 10_000, weight_col="n_chars", seed=11
    ).to_pandas()
    assert len(allr) == len(ok)
    with pytest.raises(ValueError):
        weighted_sample(rd.from_pandas(df), 0, weight_col="n_chars")


def test_weighted_sample_prefers_heavy_rows(ray_session):
    """Statistical sanity: across many disjoint seeds, rows with 100x
    the weight are selected far more often."""
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sampling import weighted_sample

    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_chars": np.where(np.arange(n) < 20, 10_000, 100).astype(
                np.int64
            ),
        }
    )
    ds = rd.from_pandas(df)
    heavy_hits = light_hits = 0
    for seed in range(10):
        got = weighted_sample(ds, 10, weight_col="n_chars", seed=seed)
        ids = got.to_pandas()["doc_id"].to_numpy()
        heavy_hits += int((ids < 20).sum())
        light_hits += int((ids >= 20).sum())
    assert heavy_hits > 5 * light_hits


def test_quota_sample_exact_counts(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.sampling import (
        lehmer_hash,
        quota_sample,
    )

    rng = np.random.default_rng(51)
    n = 700
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "zh", "fr"], size=n),
        }
    )
    quotas = {"en": 50, "de": 10, "zh": 0, "it": 5}  # it: absent group
    got = (
        quota_sample(
            rd.from_pandas(df).repartition(9), quotas, group_col="lang"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # exact quota counts; unlisted group 'fr' dropped; zh quota 0
    counts = got["lang"].value_counts().to_dict()
    assert counts == {"en": 50, "de": 10}
    # selected = globally smallest hashes per group (ties impossible
    # here: lehmer is a permutation of ids)
    h = lehmer_hash(df["doc_id"].to_numpy())
    df2 = df.assign(h=h)
    for g, q in (("en", 50), ("de", 10)):
        want = set(
            df2[df2.lang == g].sort_values(["h", "doc_id"]).head(q)["doc_id"]
        )
        assert set(got[got.lang == g]["doc_id"]) == want
    # layout invariance
    again = (
        quota_sample(
            rd.from_pandas(df).repartition(29), quotas, group_col="lang"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
    # quota larger than the group keeps the whole group
    big = quota_sample(
        rd.from_pandas(df), {"en": 10**6}, group_col="lang"
    ).to_pandas()
    assert len(big) == int((df.lang == "en").sum())
    with pytest.raises(ValueError):
        quota_sample(rd.from_pandas(df), {"en": -1}, group_col="lang")
