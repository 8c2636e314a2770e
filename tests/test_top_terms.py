"""top_terms (pipelines/text.py): exact corpus top-k vocabulary vs a
naive Python counter, deterministic ties, partition invariance."""

import re
from collections import Counter

import pandas as pd


def _naive(texts, k):
    pat = re.compile(r"\w+|[^\w\s]", re.ASCII)
    c = Counter()
    for t in texts:
        c.update(pat.findall((t or "").lower()))
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(t, int(n)) for t, n in rows]


def test_top_terms_exact_and_invariant(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.text import top_terms

    texts = [
        "the cat sat on the mat.",
        "the dog ate the cat food!",
        None,
        "",
        "a b a b a -- ties: aa ab aa ab",
        "THE the The tHe",
    ] * 7
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    exp = _naive(texts, 10)
    for p in (1, 5):
        got = (
            top_terms(rd.from_pandas(df).repartition(p), k=10)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert list(zip(got["term"], got["cnt"])) == exp, p
