"""tfidf_top_terms (pipelines/text.py): exactness vs a naive Python
reference, deterministic ties, partition invariance, and the vocab
broadcast bound."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

_PAT = re.compile(r"\w+|[^\w\s]", re.ASCII)


def _naive(texts, k):
    toks = [_PAT.findall((t or "").lower()) for t in texts]
    df = Counter()
    for ts in toks:
        df.update(set(ts))
    n = float(len(texts))
    rows = []
    for i, ts in enumerate(toks):
        tf = Counter(ts)
        scored = sorted(
            ((t, c * np.log(n / df[t])) for t, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:k]
        rows += [(i, t, s, r + 1) for r, (t, s) in enumerate(scored)]
    return rows


def test_tfidf_matches_naive_and_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import tfidf_top_terms

    texts = [
        "the cat sat on the mat",
        "the dog ate the cat food",
        "quantum flux capacitor flux",
        "",
        None,
        "cat cat cat dog",
        "the the the the",
    ] * 3
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    exp = _naive(texts, 3)
    for p in (1, 6):
        got = (
            tfidf_top_terms(rd.from_pandas(df).repartition(p), k=3)
            .to_pandas()
            .sort_values(["doc_id", "rk"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp), p
        for (gi, gt, gs, gr), (ei, et, es, er) in zip(
            got.itertuples(index=False), exp
        ):
            assert (gi, gt, gr) == (ei, et, er)
            assert gs == pytest.approx(es, abs=1e-12)


def test_tfidf_vocab_bound(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import tfidf_top_terms

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "d e f"]})
    )
    with pytest.raises(ValueError, match="max_vocab_broadcast"):
        tfidf_top_terms(ds, k=1, max_vocab_broadcast=2)


def _naive_bm25(texts, k, k1=1.2, b=0.75):
    toks = [_PAT.findall((t or "").lower()) for t in texts]
    df = Counter()
    for ts in toks:
        df.update(set(ts))
    n = float(len(texts))
    avgdl = sum(len(ts) for ts in toks) / n
    rows = []
    for i, ts in enumerate(toks):
        dl = float(len(ts))
        tf = Counter(ts)
        scored = sorted(
            (
                (
                    t,
                    np.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                    * (c * (k1 + 1))
                    / (c + k1 * (1 - b + b * (dl / avgdl))),
                )
                for t, c in tf.items()
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:k]
        rows += [(i, t, s, r + 1) for r, (t, s) in enumerate(scored)]
    return rows


def test_bm25_matches_naive_and_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import bm25_top_terms

    texts = [
        "the cat sat on the mat",
        "the dog ate the cat food",
        "quantum flux capacitor flux flux flux",
        "",
        None,
        "cat cat cat dog",
        "a much longer document with many extra words to stretch "
        "the length normalization denominator well past the average",
        "the the the the",
    ] * 3
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    exp = _naive_bm25(texts, 3)
    for p in (1, 6):
        got = (
            bm25_top_terms(rd.from_pandas(df).repartition(p), k=3)
            .to_pandas()
            .sort_values(["doc_id", "rk"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp), p
        for (gi, gt, gs, gr), (ei, et, es, er) in zip(
            got.itertuples(index=False), exp
        ):
            assert (gi, gt, gr) == (ei, et, er), p
            assert gs == pytest.approx(es, rel=1e-12), (p, et)


def test_bm25_idf_positive_and_vocab_bound(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import bm25_top_terms

    # a term in EVERY document would go negative under the raw
    # Robertson idf; the Lucene +1 form keeps it positive
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["common alpha", "common beta", "common", "common"],
        }
    )
    got = bm25_top_terms(rd.from_pandas(df), k=2).to_pandas()
    assert (got["score"] > 0).all()
    with pytest.raises(ValueError, match="max_vocab_broadcast"):
        bm25_top_terms(
            rd.from_pandas(df), k=2, max_vocab_broadcast=1
        ).to_pandas()


def _naive_bm25_search(texts, q_terms, n_top, k1=1.2, b=0.75):
    toks = [_PAT.findall((t or "").lower()) for t in texts]
    df = Counter()
    for ts in toks:
        df.update(set(ts))
    n = float(len(texts))
    avgdl = sum(len(ts) for ts in toks) / n
    rows = []
    for i, ts in enumerate(toks):
        tf = Counter(ts)
        dl = float(len(ts))
        s = sum(
            np.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            * (tf[t] * (k1 + 1))
            / (tf[t] + k1 * (1 - b + b * (dl / avgdl)))
            for t in q_terms
            if tf[t]
        )
        if s > 0:
            rows.append((i, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:n_top]


def test_bm25_search_matches_naive_and_block_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import bm25_search

    rng = np.random.default_rng(71)
    vocab = ["table", "scan", "merge", "row", "key", "agg", "hash",
             "part", "fast", "slow"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(40)
    ] + ["", None]
    exp = _naive_bm25_search(texts, ["merge", "scan", "table"], 7)
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    for p in (1, 9):
        got = bm25_search(
            rd.from_pandas(df).repartition(p),
            "table scan merge table",  # duplicate query terms count once
            top_n=7,
        ).to_pandas()
        assert got["rank"].tolist() == list(range(1, len(exp) + 1)), p
        assert got["doc_id"].tolist() == [i for i, _ in exp], p
        np.testing.assert_allclose(
            got["score"].to_numpy(), [s for _, s in exp], rtol=1e-12
        )
    with pytest.raises(ValueError, match="tokens"):
        bm25_search(rd.from_pandas(df), "   ")
