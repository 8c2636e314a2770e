"""Training-data curation operators added in round 3: Gopher-style
repetition signals, fixed-size chunking, benchmark n-gram
decontamination (pipelines/text.py) and per-group embedding centroids
(pipelines/similarity.py).

Contracts: (1) each operator equals a naive per-document / per-group
Python reference, including NaN masks for short documents; (2) outputs
are invariant to block layout; (3) loud errors on contract violations
(bad chunk params, ragged embeddings, oversized broadcast)."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from light_curve_feature_ray.pipelines.similarity import group_centroid
from light_curve_feature_ray.pipelines.text import (
    boilerplate_score,
    chunk_text,
    ngram_decontaminate,
    repetition_stats,
)

_TOKEN_RE = re.compile(r"[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\r\f\v]")

DOCS = [
    "",  # empty -> all-NaN fractions
    "solo",  # 1 token -> bigram/trigram NaN
    "two words",  # 2 tokens -> trigram NaN
    "a a a a a",  # degenerate: every fraction saturates
    "the cat sat on the mat the cat sat again",
    "x y " * 30,  # pure bigram repetition
    "alpha beta gamma delta epsilon zeta eta theta",
    "Mixed CASE Mixed case mixed CaSe",
    "punct, punct, punct! and; more.",
]


def _toks(text):
    return _TOKEN_RE.findall(text.lower())


def _naive_repetition(text):
    t = _toks(text)
    n = len(t)
    bi = list(zip(t, t[1:]))
    tri = list(zip(t, t[1:], t[2:]))
    return (
        n,
        max(Counter(t).values()) / n if n else np.nan,
        max(Counter(bi).values()) / (n - 1) if n >= 2 else np.nan,
        1.0 - len(set(tri)) / (n - 2) if n >= 3 else np.nan,
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": np.arange(len(DOCS), dtype=np.int64), "text": DOCS}
    )
    return rd.from_pandas(df)


def test_repetition_matches_naive(docs_ds):
    got = repetition_stats(docs_ds).to_pandas().sort_values("doc_id")
    for _, row in got.iterrows():
        n, f_tok, f_bi, f_tri = _naive_repetition(DOCS[int(row.doc_id)])
        assert row.n_tokens == n
        for a, b in (
            (row.top_token_frac, f_tok),
            (row.top_bigram_frac, f_bi),
            (row.dup_trigram_frac, f_tri),
        ):
            assert (np.isnan(a) and np.isnan(b)) or a == pytest.approx(b)


def test_repetition_partition_invariance(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": np.arange(len(DOCS), dtype=np.int64), "text": DOCS}
    )
    a = repetition_stats(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    b = (
        repetition_stats(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def _naive_chunks(text, size, overlap):
    n, stride = len(text), size - overlap
    k = max(1, -(-(n - overlap) // stride))
    return [text[i * stride : i * stride + size] for i in range(k)]


def test_chunk_text_matches_naive(docs_ds):
    size, overlap = 7, 3
    got = chunk_text(docs_ds, size=size, overlap=overlap).to_pandas()
    for doc_id, grp in got.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        want = _naive_chunks(DOCS[int(doc_id)], size, overlap)
        assert list(grp.chunk_idx) == list(range(len(want)))
        assert list(grp.chunk) == want
        # every chunk after the first extends past the previous one's
        # end (no fully-contained duplicate tail chunk)
        assert all(len(c) > overlap for c in want[1:])
    # every doc survives, even the empty one
    assert set(got.doc_id) == set(range(len(DOCS)))
    # coverage: chunks span the full document
    for doc_id, grp in got.groupby("doc_id"):
        parts = list(grp.sort_values("chunk_idx").chunk)
        stride = size - overlap
        assert (len(parts) - 1) * stride + len(parts[-1]) == len(
            DOCS[int(doc_id)]
        )


def test_chunk_text_overlap_reconstructs(docs_ds):
    # stitching chunks minus their overlap reproduces the document
    size, overlap = 10, 4
    got = chunk_text(docs_ds, size=size, overlap=overlap).to_pandas()
    for doc_id, grp in got.groupby("doc_id"):
        parts = list(grp.sort_values("chunk_idx").chunk)
        text = parts[0] + "".join(p[overlap:] for p in parts[1:])
        assert text == DOCS[int(doc_id)]


def test_chunk_text_validates_params(docs_ds):
    with pytest.raises(ValueError):
        chunk_text(docs_ds, size=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_text(docs_ds, size=10, overlap=-1)


def _naive_grams(text, n):
    t = _toks(text)
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_decontaminate_matches_naive(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = ["w%d" % i for i in range(12)]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 20))) for _ in range(60)
    ]
    bench = [" ".join(rng.choice(vocab, size=15)) for _ in range(5)]
    # plant literal contamination: doc 0 embeds a benchmark span
    n = 3
    corpus[0] = "zzz " + " ".join(bench[0].split()[4 : 4 + n]) + " qqq"
    corpus_ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(corpus), dtype=np.int64), "text": corpus}
        )
    ).repartition(4)
    bench_ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(bench), dtype=np.int64), "text": bench}
        )
    )
    got = (
        ngram_decontaminate(corpus_ds, bench_ds, n=n)
        .to_pandas()
        .sort_values("doc_id")
    )
    bench_grams = set().union(*(_naive_grams(b, n) for b in bench))
    want = [bool(_naive_grams(c, n) & bench_grams) for c in corpus]
    assert list(got.contaminated) == want
    assert bool(got.contaminated.iloc[0]) is True  # the planted hit


def test_decontaminate_broadcast_bound(docs_ds):
    with pytest.raises(ValueError, match="max_bench_broadcast"):
        ngram_decontaminate(docs_ds, docs_ds, n=1, max_bench_broadcast=2)


def test_group_centroid_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n, d = 200, 16
    labels = rng.integers(0, 5, size=n).astype(np.int32)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "label": pa.array(labels),
            "embedding": pa.array(
                list(emb), type=pa.list_(pa.float32())
            ),
        }
    )
    got = (
        group_centroid(rd.from_arrow(tbl).repartition(7))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert len(got) == 5 * d
    for lab in range(5):
        mask = labels == lab
        want = emb[mask].astype(np.float64).mean(axis=0)
        rows = got[got.label == lab]
        assert list(rows.n_vectors) == [int(mask.sum())] * d
        np.testing.assert_allclose(rows.centroid.to_numpy(), want, rtol=1e-12)


BOILER_DOCS = [
    "",  # no grams -> NaN fraction
    "one two",  # shorter than n=3 -> NaN fraction
    "copyright footer text all rights reserved",  # shared boilerplate A
    "page one content copyright footer text all rights reserved",  # A again
    "totally unique words nobody else repeats here",
    "another page copyright footer text plus extras",  # shares a prefix of A
    "x y x y x y x y",  # internal repetition only (df of its grams = 1)
]


def _naive_boilerplate(docs, n=3, threshold=2):
    grams = [_naive_grams(t, n) for t in docs]
    df = Counter(g for s in grams for g in s)
    out = []
    for s in grams:
        nd = len(s)
        nc = sum(1 for g in s if df[g] >= threshold)
        out.append((nd, nc, nc / nd if nd else np.nan))
    return out


def test_boilerplate_matches_naive(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(BOILER_DOCS), dtype=np.int64),
                "text": BOILER_DOCS,
            }
        )
    ).repartition(3)
    got = boilerplate_score(ds, n=3, df_threshold=2).to_pandas().sort_values(
        "doc_id"
    )
    want = _naive_boilerplate(BOILER_DOCS)
    for _, row in got.iterrows():
        nd, nc, frac = want[int(row.doc_id)]
        assert row.n_distinct_grams == nd
        assert row.n_common_grams == nc
        assert (np.isnan(row.common_gram_frac) and np.isnan(frac)) or (
            row.common_gram_frac == pytest.approx(frac)
        )
    # the planted shared block is actually detected
    assert got.set_index("doc_id").loc[2, "n_common_grams"] > 0
    # purely self-repetitive doc shares nothing across the corpus
    assert got.set_index("doc_id").loc[6, "n_common_grams"] == 0


def test_boilerplate_partition_invariance(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(BOILER_DOCS), dtype=np.int64),
            "text": BOILER_DOCS,
        }
    )
    a = boilerplate_score(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    b = (
        boilerplate_score(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_boilerplate_broadcast_bound(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(BOILER_DOCS), dtype=np.int64),
            "text": BOILER_DOCS,
        }
    )
    with pytest.raises(ValueError, match="max_gram_broadcast"):
        boilerplate_score(
            rd.from_pandas(df), n=1, df_threshold=1, max_gram_broadcast=2
        )


def test_boilerplate_validates_params(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError):
        boilerplate_score(ds, n=0)
    with pytest.raises(ValueError):
        boilerplate_score(ds, df_threshold=0)


def test_group_centroid_rejects_ragged(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "label": pa.array([0, 1], type=pa.int32()),
            "embedding": pa.array(
                [[1.0, 2.0], [1.0, 2.0, 3.0]], type=pa.list_(pa.float32())
            ),
        }
    )
    with pytest.raises(Exception, match="fixed-length"):
        group_centroid(rd.from_arrow(tbl)).to_pandas()
