"""Text-analysis + deduplication operators over a ``documents`` table
(doc_id, text, ...). Engine-side additions for large-scale training-data
pipelines (no reference counterpart; patterns follow the Ray Data guide:
vectorized map_batches + pre-aggregated groupbys; MinHash/LSH per Broder
1997 / Leskovec et al., "Mining of Massive Datasets" ch.3).

All deterministic: fixed hash seeds, no RNG at eval time.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\S+")
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.ASCII)

# small English stopword list shared with the SQL oracle (__ray_entry__.py)
EN_STOPWORDS = (
    "the of and to in a is that for it as with on be by this are or at from".split()
)
_EN_STOP = frozenset(EN_STOPWORDS)


def _md5_hex(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds):
    """Hash-partition + per-group first: one row per distinct text, keeping
    the smallest doc_id (deterministic across any shuffle order).
    Returns (doc_id, text_md5)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "text_md5": _md5_hex(batch["text"])}
        )

    hashed = docs_ds.map_batches(add_hash, batch_format="pandas", batch_size=4096)
    return hashed.groupby("text_md5").map_groups(
        lambda g: g.nsmallest(1, "doc_id")[["doc_id", "text_md5"]],
        batch_format="pandas",
    )


def fingerprint(docs_ds):
    """Content fingerprint per document (md5 hex)."""
    return docs_ds.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b["doc_id"], "fp": _md5_hex(b["text"])}
        ),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# text statistics / quality / language id
# ---------------------------------------------------------------------------


def _stats_frame(batch: pd.DataFrame) -> pd.DataFrame:
    text = batch["text"]
    n_chars = text.str.len().astype("int64")
    n_words = text.str.count(_WORD_RE).astype("int64")
    non_space = text.str.count(r"\S").astype("int64")
    words = text.str.findall(_WORD_RE)
    stop_hits = words.map(lambda ws: sum(1 for w in ws if w.lower() in _EN_STOP))
    with np.errstate(invalid="ignore"):
        avg_word_len = np.where(n_words > 0, non_space / n_words, np.nan)
        stop_ratio = np.where(n_words > 0, stop_hits / n_words, np.nan)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_words": n_words,
            "avg_word_len": avg_word_len,
            "stop_ratio": stop_ratio,
        }
    )


def text_stats(docs_ds):
    """Per-document length / word-count / quality-signal columns."""
    return docs_ds.map_batches(_stats_frame, batch_format="pandas")


def lang_id(docs_ds, threshold: float = 0.08):
    """Stopword-ratio language heuristic: 'en' iff the fraction of words in
    the English stop list reaches ``threshold``."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        st = _stats_frame(batch)
        pred = np.where(
            np.nan_to_num(st["stop_ratio"].to_numpy(), nan=0.0) >= threshold,
            "en",
            "other",
        )
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": pred})

    return docs_ds.map_batches(f, batch_format="pandas")


def token_count(docs_ds):
    """BPE-ish token counting: \\w+ runs and single punctuation marks
    (ASCII classes, mirrored by the SQL oracle's regexp_extract_all)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["text"]
                .str.count(_TOKEN_RE)
                .astype("int64"),
            }
        )

    return docs_ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# near-duplicate detection
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-gram shingles (md5-based, deterministic)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[:8], "little"
        )
    return out


class MinHasher:
    """num_perms universal-hash minhash signatures over shingle hashes.
    Stateful (permutation coefficients) => actor-pool stage."""

    def __init__(self, num_perms: int = 64, seed: int = 1234, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perms, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perms, dtype=np.uint64)
        self.num_perms = num_perms
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text, self.shingle_k)
        # multiply-shift universal hash family mod 2^64 (inputs are already
        # uniform md5-derived 64-bit values; uint64 wraparound is the mod)
        h = x[None, :] * self.a[:, None] + self.b[:, None]
        return h.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(
            [self.signature(t) for t in batch["text"]]
        )  # (n, num_perms)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "sig": list(sigs),
            }
        )


def jaccard_words(a: str, b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_dups(
    docs_ds,
    num_perms: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    shingle_k: int = 3,
):
    """MinHash + LSH near-duplicate pairs.

    shingle → minhash (actor pool) → explode to (band, band_hash, doc)
    rows → groupby band bucket → candidate pairs → exact shingle-Jaccard
    verification (a second small join against the text by doc_id, broadcast
    because candidates are few). Returns (doc_a, doc_b, jaccard) with
    doc_a < doc_b, jaccard >= threshold.
    """
    rows_per_band = num_perms // bands

    sigs = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perms": num_perms, "shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=(1, 8),
    )

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_doc = [], [], []
        for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_band.append(b)
                out_hash.append(h)
                out_doc.append(doc_id)
        return pd.DataFrame(
            {"band": out_band, "band_hash": out_hash, "doc_id": out_doc}
        )

    buckets = sigs.map_batches(explode_bands, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = buckets.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    pair_df = pairs.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    if pair_df.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    # verify: fetch texts of candidate docs (small set) and compute exact
    # shingle Jaccard
    cand_ids = set(pair_df["doc_a"]).union(pair_df["doc_b"])
    texts = {}
    for batch in docs_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        sel = batch[batch["doc_id"].isin(cand_ids)]
        texts.update(zip(sel["doc_id"], sel["text"]))
    jac = [
        jaccard_words(texts[a], texts[b], shingle_k)
        for a, b in zip(pair_df["doc_a"], pair_df["doc_b"])
    ]
    pair_df = pair_df.assign(jaccard=jac)
    out = pair_df[pair_df["jaccard"] >= threshold].reset_index(drop=True)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


class SimHasher:
    """64-bit SimHash over word unigrams (deterministic md5 word hashes)."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def _word_hash(self, w: str) -> int:
        h = self._cache.get(w)
        if h is None:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            self._cache[w] = h
        return h

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in _WORD_RE.findall(text.lower()):
            h = self._word_hash(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": [self.simhash(t) for t in batch["text"]],
            }
        )


def simhash_signatures(docs_ds):
    return docs_ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 8))
