"""Bloom-filter sketch (pipelines/sketches.py) and corpus unigram-LM
scoring (pipelines/text.py lm_score).

Contracts: (1) the bloom NEVER false-negatives and its false-positive
rate is near the analytic bound; (2) the packed words are exactly
invariant to partitioning (bitwise-OR lattice); (3) lm_score equals a
naive Counter-based reference, unseen tokens get the smoothing floor;
(4) loud guards on bad parameters."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from light_curve_feature_ray.pipelines.sketches import (
    bloom_probe,
    bloom_semi_join,
    bloom_sketch,
)
from light_curve_feature_ray.pipelines.text import _TOKEN_RE, lm_score


@pytest.fixture(scope="module")
def member_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"key": np.arange(0, 6000, 2, dtype=np.int64)})
    )


def test_bloom_no_false_negatives_and_fp_bound(member_ds):
    k, m = 4, 1 << 15
    words = bloom_sketch(member_ds, "key", k=k, m_bits=m)
    members = np.arange(0, 6000, 2, dtype=np.int64)
    assert bloom_probe(words, members, k=k).all()  # no false negatives
    non_members = np.arange(1, 60001, 2, dtype=np.int64)
    fp = bloom_probe(words, non_members, k=k).mean()
    expected = (1 - math.exp(-k * len(members) / m)) ** k
    assert fp < 4 * expected + 0.01


def test_bloom_partition_invariance(member_ds):
    k, m = 3, 1 << 12
    a = bloom_sketch(member_ds, "key", k=k, m_bits=m)
    b = bloom_sketch(member_ds.repartition(7), "key", k=k, m_bits=m)
    assert np.array_equal(a, b)


def test_bloom_semi_join_flags(ray_session, member_ds):
    import ray.data as rd

    k, m = 4, 1 << 15
    words = bloom_sketch(member_ds, "key", k=k, m_bits=m)
    probe = rd.from_pandas(
        pd.DataFrame({"key": np.array([0, 2, 4, 9999999], dtype=np.int64)})
    )
    out = (
        bloom_semi_join(probe, "key", words, k=k)
        .to_pandas()
        .sort_values("key")
    )
    assert list(out.bloom_hit[:3]) == [True, True, True]


def test_bloom_validates_params(member_ds):
    with pytest.raises(ValueError):
        bloom_sketch(member_ds, "key", k=9)
    with pytest.raises(ValueError):
        bloom_sketch(member_ds, "key", m_bits=100)


DOCS = [
    "",
    "the the the cat",
    "rare unique singleton tokens",
    "the cat sat on the mat",
]


def _naive_lm_scores(docs):
    toks = [_TOKEN_RE.findall(d.lower()) for d in docs]
    cnt = Counter(t for ts in toks for t in ts)
    total, v = sum(cnt.values()), len(cnt)
    out = []
    for ts in toks:
        if not ts:
            out.append(np.nan)
            continue
        lp = sum(math.log((cnt[t] + 1.0) / (total + v)) for t in ts)
        out.append(-lp / len(ts))
    return out


def test_lm_score_matches_naive(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(DOCS), dtype=np.int64), "text": DOCS}
        )
    ).repartition(3)
    got = lm_score(ds).to_pandas().sort_values("doc_id")
    want = _naive_lm_scores(DOCS)
    for g, w in zip(got.avg_neg_logprob, want):
        assert (np.isnan(g) and np.isnan(w)) or g == pytest.approx(w, rel=1e-12)
    # the repeated-common-word doc scores LOWER (more typical) than the
    # all-singletons doc
    assert (
        got.avg_neg_logprob.iloc[1] < got.avg_neg_logprob.iloc[2]
    )


def test_lm_score_vocab_bound(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": ["a b c d e f g h"]})
    )
    with pytest.raises(ValueError, match="max_vocab_broadcast"):
        lm_score(ds, max_vocab_broadcast=2)
