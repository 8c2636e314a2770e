"""Text-analysis + deduplication operators over a ``documents`` table
(doc_id, text, ...). Engine-side additions for large-scale training-data
pipelines (no reference counterpart; patterns follow the Ray Data guide:
vectorized map_batches + pre-aggregated groupbys; MinHash/LSH per Broder
1997 / Leskovec et al., "Mining of Massive Datasets" ch.3).

All deterministic: fixed hash seeds, no RNG at eval time. Hot paths are
vectorized end to end: tokenization + word hashing via polars (ahash),
shingle hashes via a polynomial combine of word hashes (numpy uint64
wraparound), minhash via per-permutation ``minimum.reduceat`` over the
flat shingle array — no per-row Python in any per-document loop.

Scale notes (100-TB posture):
- exact dedup is a pure ``groupby().min()`` aggregate (partial per-block
  combine, one shuffle of (hash, id) pairs only);
- MinHash-LSH candidate generation caps band-bucket membership
  (``max_bucket``) so one degenerate band hash cannot go quadratic; drops
  are logged;
- candidate *verification* stays distributed: only candidate doc ids are
  broadcast (``ray.put``); texts ship through a keyed shuffle of candidate
  docs only, never via a driver-side corpus scan.
"""

from __future__ import annotations

import hashlib
import logging
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_WORD_RE = re.compile(r"\S+")
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.ASCII)

# small English stopword list shared with the SQL oracle (__ray_entry__.py)
EN_STOPWORDS = (
    "the of and to in a is that for it as with on be by this are or at from".split()
)
_EN_STOP = frozenset(EN_STOPWORDS)

_HASH_SEED = 7  # polars ahash seed for word hashing (fixed => deterministic)
_POLY = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for combines
_EMPTY_SHINGLE = np.uint64(0x9E3779B97F4A7C15)  # hash of the empty doc


def _md5_hex(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


# ---------------------------------------------------------------------------
# vectorized tokenization / shingling (shared by minhash, simhash, stats)
# ---------------------------------------------------------------------------


def _word_hashes_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """Lowercased whitespace tokens of each text, hashed. Returns
    (flat uint64 word hashes, per-doc word counts)."""
    import polars as pl

    s = pl.Series("t", texts, dtype=pl.String).fill_null("")
    words = s.str.to_lowercase().str.extract_all(r"\S+")
    lens = words.list.len().to_numpy().astype(np.int64)
    flat = words.explode().drop_nulls()  # empty lists explode to one null
    h = flat.hash(seed=_HASH_SEED).to_numpy().astype(np.uint64)
    return h, lens


def _shingle_hashes_flat(
    h: np.ndarray, lens: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of word k-gram shingles per document, from the flat word-hash
    array. Docs with 0 < n < k words get ONE shingle combining all their
    words; empty docs get the constant empty-shingle hash (mirrors the
    one-shingle semantics of joining the words of a short doc).
    Returns (flat shingle hashes, per-doc shingle counts)."""
    n = h.shape[0]
    ndocs = lens.shape[0]
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    counts = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    total = int(counts.sum())
    doc_of = np.repeat(np.arange(ndocs), counts)
    run_starts = np.r_[0, np.cumsum(counts)[:-1]]
    offset = np.arange(total) - run_starts[doc_of]
    pos = starts[doc_of] + offset

    # polynomial rolling hash over every stride-1 window of the flat array
    if n >= k:
        r = h[: n - k + 1].copy()
        for i in range(1, k):
            r = r * _POLY + h[i : n - k + 1 + i]
    else:
        r = np.empty(0, dtype=np.uint64)
    sh = np.empty(total, dtype=np.uint64)
    full = lens[doc_of] >= k
    if full.any():
        sh[full] = r[np.minimum(pos[full], max(n - k, 0))]
    short = ~full
    if short.any():
        # docs with < k words: one shingle = polynomial over all their
        # words — vectorized as at most k-1 rounds over ALL short docs at
        # once (round j folds word j into every short doc that has one)
        sj = np.flatnonzero(short)
        docs_s = doc_of[sj]
        lens_s = lens[docs_s]
        starts_s = starts[docs_s]
        acc = np.zeros(sj.shape[0], dtype=np.uint64)
        for j in range(int(lens_s.max(initial=0))):
            has = lens_s > j
            acc[has] = acc[has] * _POLY + h[starts_s[has] + j]
        acc[lens_s == 0] = _EMPTY_SHINGLE
        sh[sj] = acc
    return sh, counts


def _shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Shingle hashes of one text (same definition as the batched path)."""
    h, lens = _word_hashes_flat([text])
    sh, _ = _shingle_hashes_flat(h, lens, k)
    return np.unique(sh)


def jaccard_words(a: str, b: str, k: int = 3) -> float:
    sa, sb = _shingle_set(a, k), _shingle_set(b, k)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds):
    """Hash-partition + min aggregate: one row per distinct text, keeping
    the smallest doc_id (deterministic across any shuffle order).
    A pure ``groupby().min()`` — Ray Data pre-combines per block, so only
    (text_md5, doc_id) partials cross the exchange. Returns
    (doc_id, text_md5)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "text_md5": _md5_hex(batch["text"])}
        )

    hashed = docs_ds.map_batches(add_hash, batch_format="pandas", batch_size=None)
    agg = hashed.groupby("text_md5").min("doc_id")
    return agg.map_batches(
        lambda b: pa.table(
            {"doc_id": b["min(doc_id)"], "text_md5": b["text_md5"]}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def fingerprint(docs_ds):
    """Content fingerprint per document (md5 hex)."""
    return docs_ds.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b["doc_id"], "fp": _md5_hex(b["text"])}
        ),
        batch_format="pandas",
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# text statistics / quality / language id
# ---------------------------------------------------------------------------


def _stats_frame(batch: pd.DataFrame) -> pd.DataFrame:
    import polars as pl

    text = batch["text"]
    s = pl.Series("t", text.to_numpy(), dtype=pl.String).fill_null("")
    n_chars = s.str.len_chars().to_numpy().astype("int64")
    non_space = s.str.replace_all(r"\s", "").str.len_chars().to_numpy().astype("int64")
    words = s.str.to_lowercase().str.extract_all(r"\S+")
    n_words = words.list.len().to_numpy().astype("int64")
    stop_hits = (
        words.list.eval(pl.element().is_in(list(_EN_STOP)))
        .list.sum()
        .fill_null(0)
        .to_numpy()
        .astype("int64")
    )
    # explicit ASCII class (same as the token-count oracle) so the SQL
    # side's RE2 counts the identical characters
    punct = (
        s.str.count_matches(r"[^0-9A-Za-z_ \t\n\r\f\v]")
        .fill_null(0)
        .to_numpy()
        .astype("int64")
    )
    with np.errstate(invalid="ignore"):
        avg_word_len = np.where(n_words > 0, non_space / n_words, np.nan)
        stop_ratio = np.where(n_words > 0, stop_hits / n_words, np.nan)
        punct_ratio = np.where(n_chars > 0, punct / n_chars, np.nan)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_words": n_words,
            "avg_word_len": avg_word_len,
            "stop_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
        }
    )


def text_stats(docs_ds):
    """Per-document length / word-count / quality-signal columns."""
    return docs_ds.map_batches(
        _stats_frame, batch_format="pandas", batch_size=None
    )


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

    return docs_ds.map_batches(f, batch_format="pandas", batch_size=None)


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

    return docs_ds.map_batches(f, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# near-duplicate detection
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """num_perms universal-hash minhash signatures over shingle hashes.
    Stateful (permutation coefficients) => actor-pool stage. Fully
    vectorized: one ``minimum.reduceat`` pass per permutation chunk over
    the batch's flat shingle array."""

    def __init__(self, num_perms: int = 64, seed: int = 1234, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perms, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perms, dtype=np.uint64)
        self.num_perms = num_perms
        self.shingle_k = shingle_k

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perms) uint64 signature matrix."""
        h, lens = _word_hashes_flat(texts)
        if lens.shape[0] == 0:
            # empty Ray blocks are routine; reduceat([0]) on a zero-width
            # matrix raises
            return np.empty((0, self.num_perms), dtype=np.uint64)
        sh, counts = _shingle_hashes_flat(h, lens, self.shingle_k)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        ndocs = lens.shape[0]
        out = np.empty((ndocs, self.num_perms), dtype=np.uint64)
        # chunk permutations to bound the (chunk, n_shingles) temp matrix
        chunk = max(1, min(self.num_perms, (1 << 22) // max(sh.size, 1)))
        for p0 in range(0, self.num_perms, chunk):
            a = self.a[p0 : p0 + chunk, None]
            b = self.b[p0 : p0 + chunk, None]
            vals = sh[None, :] * a + b  # uint64 wraparound is the mod
            out[:, p0 : p0 + chunk] = np.minimum.reduceat(
                vals, starts, axis=1
            ).T
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(batch["text"].to_numpy())
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "sig": list(sigs),
            }
        )


def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64: polynomial combine of each band's rows."""
    n, num_perms = sigs.shape
    rows = num_perms // bands
    banded = sigs[:, : bands * rows].reshape(n, bands, rows)
    bh = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):
        bh = bh * _POLY + banded[:, :, r]
    return bh


def minhash_lsh_dups(
    docs_ds,
    num_perms: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    shingle_k: int = 3,
    max_bucket: int = 64,
    id_col: str = "doc_id",
):
    """MinHash + LSH near-duplicate pairs, fully distributed.

    shingle → minhash (actor pool) → (band, band_hash, doc) rows →
    groupby band bucket → candidate pairs (bucket capped at ``max_bucket``
    smallest ids; overflow logged) → pair dedup (groupby) → verification:
    candidate ids broadcast via ``ray.put``, candidate docs' texts shipped
    through a keyed shuffle, exact shingle-Jaccard computed in a
    distributed ``map_groups``. No driver-side corpus scan at any point.

    Returns a Dataset of (doc_a, doc_b, jaccard), doc_a < doc_b,
    jaccard >= threshold.
    """
    import ray

    rows_per_band = num_perms // bands
    assert rows_per_band * bands == num_perms

    hasher_kwargs = {"num_perms": num_perms, "shingle_k": shingle_k}

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        mh = MinHasher(**hasher_kwargs)
        sigs = mh.signatures(batch["text"].to_numpy())
        bh = _band_hashes(sigs, bands)  # (n, bands)
        n = bh.shape[0]
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "band_hash": bh.reshape(-1).view(np.int64),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
            }
        )

    buckets = docs_ds.map_batches(
        explode_bands, batch_format="pandas", batch_size=None
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=ids.dtype),
                 "doc_b": pd.Series([], dtype=ids.dtype)}
            )
        if len(ids) > max_bucket:
            logger.warning(
                "minhash_lsh: band bucket of size %d capped to %d "
                "(band=%s) — near-dups among the dropped tail of this "
                "bucket are not candidates this run",
                len(ids), max_bucket, g["band"].iloc[0],
            )
            ids = ids[:max_bucket]
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = buckets.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a pair surfacing in several bands is still one candidate:
    # count() aggregate + column drop = distinct, no per-pair Python
    pairs = pairs.groupby(["doc_a", "doc_b"]).count().map_batches(
        lambda b: b.drop_columns(["count()"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    # consumed twice below (id broadcast + side explosion); the pair set is
    # small (bucket-capped) so pin it rather than re-running the LSH stages
    pairs = pairs.materialize()

    # ---- distributed verification ------------------------------------
    # candidate ids (bounded: <= 2 * max_bucket^2/2 * n_buckets pairs,
    # already capped) are the ONLY thing materialized on the driver
    cand_ids = set()
    for b in pairs.iter_batches(batch_size=None, batch_format="pandas"):
        cand_ids.update(b["doc_a"])
        cand_ids.update(b["doc_b"])
    if not cand_ids:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        )
    ids_ref = ray.put(frozenset(cand_ids))

    def filter_cands(batch: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(ids_ref)
        sel = batch[batch[id_col].isin(ids)]
        return pd.DataFrame(
            {
                "doc_id": sel[id_col].to_numpy(),
                "doc_a": np.zeros(len(sel), dtype=np.int64),
                "doc_b": np.zeros(len(sel), dtype=np.int64),
                "is_text": np.ones(len(sel), dtype=np.int8),
                "text": sel["text"].to_numpy(),
            }
        )

    cand_texts = docs_ds.map_batches(
        filter_cands, batch_format="pandas", batch_size=None
    )

    def pair_sides(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([a, b]),
                "doc_a": np.concatenate([a, a]),
                "doc_b": np.concatenate([b, b]),
                "is_text": np.zeros(2 * n, dtype=np.int8),
                "text": np.full(2 * n, "", dtype=object),
            }
        )

    sides = pairs.map_batches(pair_sides, batch_format="pandas", batch_size=None)

    def attach_text(g: pd.DataFrame) -> pd.DataFrame:
        txt = g[g["is_text"] == 1]
        if txt.empty:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "side_id": [], "text": []}
            )
        text = txt["text"].iloc[0]
        asn = g[g["is_text"] == 0]
        return pd.DataFrame(
            {
                "doc_a": asn["doc_a"].to_numpy(),
                "doc_b": asn["doc_b"].to_numpy(),
                "side_id": asn["doc_id"].to_numpy(),
                "text": np.full(len(asn), text, dtype=object),
            }
        )

    attached = cand_texts.union(sides).groupby("doc_id").map_groups(
        attach_text, batch_format="pandas"
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) != 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        g = g.sort_values("side_id")
        j = jaccard_words(g["text"].iloc[0], g["text"].iloc[1], shingle_k)
        if j < threshold:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        return pd.DataFrame(
            {
                "doc_a": [g["doc_a"].iloc[0]],
                "doc_b": [g["doc_b"].iloc[0]],
                "jaccard": [j],
            }
        )

    return attached.groupby(["doc_a", "doc_b"]).map_groups(
        verify, batch_format="pandas"
    )


class SimHasher:
    """64-bit SimHash over word unigrams, vectorized: explode + hash words
    once per batch, unpack bits to a (n_words, 64) sign matrix, per-doc
    ``add.reduceat``, re-pack the positive-sum bits."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        h, lens = _word_hashes_flat(batch["text"].to_numpy())
        ndocs = lens.shape[0]
        out = np.zeros(ndocs, dtype=np.uint64)
        nz = np.flatnonzero(lens > 0)
        if nz.size:
            starts_all = np.r_[0, np.cumsum(lens)[:-1]]
            starts = starts_all[nz]
            bits = np.unpackbits(
                h[:, None].view(np.uint8), axis=1, bitorder="little"
            ).astype(np.int32)  # (n_words, 64), bit i of each word hash
            signs = 2 * bits - 1
            acc = np.add.reduceat(signs, starts, axis=0)  # (n_nz, 64)
            packed = np.packbits(
                (acc > 0).astype(np.uint8), axis=1, bitorder="little"
            )
            out[nz] = packed.view(np.uint64).ravel()
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "simhash": out}
        )


def simhash_signatures(docs_ds):
    return docs_ds.map_batches(
        SimHasher, batch_format="pandas", concurrency=(1, 8), batch_size=None
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (rare-shingle inverted pair counting)
# ---------------------------------------------------------------------------


def ngram_jaccard_dups(
    docs_ds,
    k: int = 5,
    threshold: float = 0.4,
    max_df: int = 100,
):
    """EXACT word-k-gram Jaccard near-duplicate pairs via inverted pair
    counting — the deterministic complement to the approximate MinHash
    path. Word k-grams (k>=5) are rare by construction (df ~ 1-2 for
    non-duplicated text), so the pair explosion Sum(df^2) stays linear in
    the corpus; grams with df > ``max_df`` (boilerplate) are dropped on
    both sides of the driver oracle, bounding the worst case.

    Pipeline: distinct shingle hashes per doc (vectorized, with the
    per-doc gram count carried on every row) -> groupby(gram) -> pairs
    (doc_a, doc_b, na, nb) -> groupby(pair) -> co-occurrence count ->
    jaccard = co / (na + nb - co) >= threshold. Every stage is a
    pre-aggregated groupby; nothing materializes on the driver.
    """
    import pyarrow as pa

    def explode_grams(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"gram": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "n_grams": pd.Series([], dtype=np.int64)}
            )
        h, lens = _word_hashes_flat(batch["text"].to_numpy())
        sh, counts = _shingle_hashes_flat(h, lens, k)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        doc_ids = batch["doc_id"].to_numpy()
        # distinct grams per doc: sort within doc segments and dedup
        doc_of = np.repeat(np.arange(len(batch)), counts)
        order = np.lexsort((sh, doc_of))
        d, g = doc_of[order], sh[order]
        keep = np.r_[True, (d[1:] != d[:-1]) | (g[1:] != g[:-1])]
        d, g = d[keep], g[keep]
        n_grams = np.bincount(d, minlength=len(batch)).astype(np.int64)
        return pd.DataFrame(
            {
                "gram": g.view(np.int64),
                "doc_id": doc_ids[d],
                "n_grams": n_grams[d],
            }
        )

    grams = docs_ds.map_batches(
        explode_grams, batch_format="pandas", batch_size=None
    )

    def gram_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) < 2 or len(grp) > max_df:
            if len(grp) > max_df:
                logger.warning(
                    "ngram_jaccard: gram with df=%d > max_df=%d dropped",
                    len(grp), max_df,
                )
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "na": [], "nb": []}
            )
        grp = grp.sort_values("doc_id").drop_duplicates("doc_id")
        ids = grp["doc_id"].to_numpy()
        ns = grp["n_grams"].to_numpy()
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"doc_a": ids[a], "doc_b": ids[b], "na": ns[a], "nb": ns[b]}
        )

    pairs = grams.groupby("gram").map_groups(gram_pairs, batch_format="pandas")

    # co-occurrence = COUNT aggregate over the pair key (na/nb are
    # functionally dependent on the doc ids, so they ride in the key);
    # jaccard + threshold are then one vectorized map_batches — no
    # per-pair Python anywhere
    counted = pairs.groupby(["doc_a", "doc_b", "na", "nb"]).count()

    def jaccard_filter(b: pd.DataFrame) -> pd.DataFrame:
        co = b["count()"].to_numpy(dtype=np.float64)
        na = b["na"].to_numpy(dtype=np.float64)
        nb = b["nb"].to_numpy(dtype=np.float64)
        j = co / (na + nb - co)
        keep = j >= threshold
        return pd.DataFrame(
            {
                "doc_a": b["doc_a"].to_numpy()[keep],
                "doc_b": b["doc_b"].to_numpy()[keep],
                "jaccard": j[keep],
            }
        )

    return counted.map_batches(
        jaccard_filter, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al., SIGMOD 2003)
# ---------------------------------------------------------------------------

_WINNOW_MOD = 281474976710597  # < 2^48: (acc*31 + c) stays < 2^53 — exact
# in BOTH int64 numpy and DuckDB BIGINT arithmetic, so the SQL oracle
# reproduces the hashes bit-for-bit


def _winnow_doc(text: str, k: int, w: int):
    """Selected fingerprints of one document: polynomial rolling hashes of
    char k-grams (mod 2^48-ish), minimum of each w-window."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    n = cps.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n < k:
        h = 0
        for c in cps:
            h = (h * 31 + int(c)) % _WINNOW_MOD
        return np.array([h], dtype=np.int64)
    # rolling polynomial over all k-windows (vectorized across positions)
    m = n - k + 1
    acc = np.zeros(m, dtype=np.int64)
    for j in range(k):
        acc = (acc * 31 + cps[j : j + m]) % _WINNOW_MOD
    if m <= w:
        mins = np.array([acc.min()])
    else:
        from numpy.lib.stride_tricks import sliding_window_view

        mins = sliding_window_view(acc, w).min(axis=1)
    return np.unique(mins)


def winnow_fingerprints(docs_ds, k: int = 5, w: int = 4):
    """Per-document winnowing fingerprint summary:
    (doc_id, n_fp, min_fp, max_fp). Deterministic and SQL-reproducible
    (the rolling hash uses exact sub-2^53 integer arithmetic)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out_n = np.empty(len(batch), dtype=np.int64)
        out_min = np.empty(len(batch), dtype=np.float64)
        out_max = np.empty(len(batch), dtype=np.float64)
        for i, text in enumerate(batch["text"]):
            fps = _winnow_doc(text or "", k, w)
            out_n[i] = fps.shape[0]
            out_min[i] = fps[0] if fps.size else np.nan
            out_max[i] = fps[-1] if fps.size else np.nan
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_fp": out_n,
                "min_fp": out_min,
                "max_fp": out_max,
            }
        )

    return docs_ds.map_batches(f, batch_format="pandas", batch_size=None)


def simhash_dups(docs_ds, max_hamming: int = 6, max_bucket: int = 256):
    """SimHash near-duplicate pairs with EXACT recall for the given radius:
    the 64-bit signature is sliced into ``max_hamming + 1`` bit-bands, so
    any pair within the Hamming radius shares at least one identical band
    (pigeonhole); same-band candidates are verified by popcount. Returns
    (doc_a, doc_b, hamming), doc_a < doc_b.

    Everything is groupby-shaped: signatures -> (band, band_value, doc,
    sig) rows -> per-bucket pair verification (bucket capped + logged) ->
    pair dedup. Hamming is verified inside the bucket task (signatures
    travel with the rows), so no second lookup pass exists."""
    nbands = max_hamming + 1
    # band bit boundaries: 64 bits split as evenly as possible
    edges = np.linspace(0, 64, nbands + 1).astype(np.int64)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sig_df = SimHasher()(batch)
        sigs = sig_df["simhash"].to_numpy().astype(np.uint64)
        n = sigs.shape[0]
        frames = []
        for b in range(nbands):
            lo, hi = edges[b], edges[b + 1]
            width = np.uint64(hi - lo)
            vals = (sigs >> np.uint64(lo)) & ((np.uint64(1) << width) - np.uint64(1))
            frames.append(
                pd.DataFrame(
                    {
                        "band": np.full(n, b, dtype=np.int32),
                        "band_val": vals.view(np.int64),
                        "doc_id": sig_df["doc_id"].to_numpy(),
                        "sig": sigs.view(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    rows = docs_ds.map_batches(explode, batch_format="pandas", batch_size=None)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        if len(g) > max_bucket:
            logger.warning(
                "simhash_dups: band bucket of size %d capped to %d",
                len(g), max_bucket,
            )
            g = g.head(max_bucket)
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy().view(np.uint64)
        a, b = np.triu_indices(len(ids), k=1)
        x = sigs[a] ^ sigs[b]
        ham = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "doc_a": ids[a[keep]],
                "doc_b": ids[b[keep]],
                "hamming": ham[keep].astype(np.int64),
            }
        )

    pairs = rows.groupby(["band", "band_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a pair found in several bands has the same hamming everywhere:
    # min() is a pure dedup aggregate (no per-pair Python)
    agg = pairs.groupby(["doc_a", "doc_b"]).min("hamming")
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_a": b["doc_a"],
                "doc_b": b["doc_b"],
                "hamming": b["min(hamming)"].astype("int64"),
            }
        ),
        batch_format="pandas",
        batch_size=None,
    )


# RE2-compatible patterns (no backreferences/lookaround) so the DuckDB
# oracle's regexp_replace applies the IDENTICAL substitution
REDACT_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("number", r"\b[0-9]{6,}\b", "<NUM>"),
)


def redact(docs_ds):
    """PII-style scrubbing: replace emails / URLs / long digit runs with
    typed placeholders. Returns (doc_id, clean_text, n_redactions) — the
    standard pre-training hygiene pass, applied in pattern order."""
    # re.ASCII pins \b, \s and \w to ASCII semantics, matching
    # DuckDB/RE2's defaults so the oracle substitutes identically on
    # non-ASCII text (Unicode-aware \b would disagree on e.g. 'caf\u00e9123456')
    compiled = [(re.compile(p, re.ASCII), rep) for _, p, rep in REDACT_PATTERNS]

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].to_numpy()
        out = np.empty(len(texts), dtype=object)
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            total = 0
            for rx, rep in compiled:
                t, n = rx.subn(rep, t)
                total += n
            out[i] = t
            counts[i] = total
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "clean_text": out,
                "n_redactions": counts,
            }
        )

    return docs_ds.map_batches(f, batch_format="pandas", batch_size=None)
