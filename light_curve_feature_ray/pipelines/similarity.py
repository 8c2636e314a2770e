"""Similarity search over an embedding column (list<float>).

- ``knn_cosine``: exact brute-force cosine top-k — the query matrix is
  broadcast once via ``ray.put``; each batch computes a numpy matmul
  partial top-k, and a tiny groupby merges partials into the final top-k
  (no all-to-all of the embedding table itself).
- ``lsh_knn_cosine``: the scale path — random-hyperplane LSH buckets
  (seeded, deterministic); only same-bucket candidates are scored.
  Approximate; recall is tested against the exact path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BatchTopK:
    """map_batches actor: scores one batch against the broadcast queries."""

    def __init__(self, query_ref, k: int):
        queries = ray.get(query_ref) if query_ref is not None else None
        self.q_ids = queries[0]
        self.q_mat = _normalize(queries[1])  # (Q, d)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(_to_matrix(batch["embedding"]))  # (n, d)
        ids = batch["vec_id"].to_numpy()
        cos = self.q_mat @ mat.T  # (Q, n)
        k = min(self.k, cos.shape[1])
        # partial top-k per query within this batch
        idx = np.argpartition(-cos, k - 1, axis=1)[:, :k]
        rows = np.repeat(self.q_ids, k)
        cols = idx.ravel()
        return pd.DataFrame(
            {
                "query_id": rows,
                "vec_id": ids[cols],
                "cosine": cos[np.repeat(np.arange(len(self.q_ids)), k), cols],
            }
        )


def _final_topk(k: int):
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "cosine"]]

    return f


def knn_cosine(emb_ds, n_queries: int = 5, k: int = 10):
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors
    (query set = rows with vec_id < n_queries; self-matches included).
    Ties broken by ascending vec_id."""
    q_rows = emb_ds.filter(
        expr=f"vec_id < {n_queries}"
    ).to_pandas()
    q_rows = q_rows.sort_values("vec_id")
    query_ref = ray.put(
        (q_rows["vec_id"].to_numpy(), _to_matrix(q_rows["embedding"]))
    )
    partials = emb_ds.map_batches(
        _BatchTopK,
        fn_constructor_args=(query_ref, k),
        batch_format="pandas",
        concurrency=(1, 8),
    )
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


class _LshBucketer:
    def __init__(self, dim: int, n_planes: int = 8, seed: int = 77):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return (signs.astype(np.uint32) << np.arange(signs.shape[1], dtype=np.uint32)).sum(
            axis=1
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(_to_matrix(batch["embedding"]))
        out = pd.DataFrame(
            {
                "vec_id": batch["vec_id"],
                "bucket": self.bucket_of(mat).astype(np.int64),
            }
        )
        out["embedding"] = list(mat)
        return out

    @staticmethod
    def for_dataset(emb_ds, n_planes=8, seed=77):
        first = emb_ds.take(1)[0]
        dim = len(first["embedding"])
        return _LshBucketer(dim, n_planes, seed)


def lsh_knn_cosine(emb_ds, n_queries: int = 5, k: int = 10, n_planes: int = 6):
    """Approximate top-k: score only vectors in the query's LSH bucket.

    Scale shape: the query buckets are computed FIRST and broadcast; the
    bucket+filter stage drops every non-candidate vector before the
    ``groupby`` — the exchange moves only vectors sharing a bucket with
    some query (for Q queries, an expected Q/2^n_planes fraction of the
    table), not the whole embedding table. ``n_planes`` should grow with
    the corpus (bucket occupancy ~ N/2^n_planes); for recall at high
    n_planes, union several hash tables (different seeds)."""
    bucketer = _LshBucketer.for_dataset(emb_ds, n_planes)
    q_rows = emb_ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q_rows = q_rows.sort_values("vec_id")
    q_mat = _normalize(_to_matrix(q_rows["embedding"]))
    q_buckets = bucketer.bucket_of(q_mat)
    q_by_bucket: dict[int, list[int]] = {}
    for qi, b in enumerate(q_buckets):
        q_by_bucket.setdefault(int(b), []).append(qi)
    q_ids = q_rows["vec_id"].to_numpy()
    ref = ray.put((q_by_bucket, q_ids, q_mat))
    wanted_arr = np.unique(q_buckets).astype(np.int64)
    wanted_ref = ray.put(wanted_arr)

    def bucket_and_filter(batch: pd.DataFrame) -> pd.DataFrame:
        out = bucketer(batch)
        wanted = ray.get(wanted_ref)
        return out[np.isin(out["bucket"].to_numpy(), wanted)]

    bucketed = emb_ds.map_batches(
        bucket_and_filter, batch_format="pandas", batch_size=None
    )

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        q_by_bucket, q_ids, q_mat = ray.get(ref)
        bucket = int(g["bucket"].iloc[0])
        qs = q_by_bucket.get(bucket, [])
        if not qs:
            return pd.DataFrame(
                {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
            )
        mat = np.stack(list(g["embedding"]))
        cos = q_mat[qs] @ mat.T
        out = []
        for row, qi in enumerate(qs):
            order = np.lexsort((g["vec_id"].to_numpy(), -cos[row]))[:k]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": q_ids[qi],
                        "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                        "vec_id": g["vec_id"].to_numpy()[order],
                        "cosine": cos[row][order],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return bucketed.groupby("bucket").map_groups(
        score_bucket, batch_format="pandas"
    )


def embedding_cosine_dups(emb_ds, threshold: float = 0.9):
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cosine) for
    all pairs with cosine >= threshold, vec_a < vec_b.

    Baseline exact path: the normalized matrix is broadcast once via
    ``ray.put`` and every batch computes one matmul block-row against it —
    the brute-force tier of the task's dedup family. The scale path for a
    corpus that can't broadcast is the LSH-bucketed candidate generation of
    :func:`lsh_knn_cosine` followed by the same per-batch verification.
    """
    rows = emb_ds.to_pandas()
    rows = rows.sort_values("vec_id")
    ids = rows["vec_id"].to_numpy()
    mat = _normalize(_to_matrix(rows["embedding"]))
    ref = ray.put((ids, mat))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        bmat = _normalize(_to_matrix(batch["embedding"]))
        bids = batch["vec_id"].to_numpy()
        cos = bmat @ all_mat.T  # (n_batch, N)
        # upper triangle only: partner id must be > this row's id
        mask = (cos >= threshold) & (bids[:, None] < all_ids[None, :])
        r, c = np.nonzero(mask)
        return pd.DataFrame(
            {
                "vec_a": bids[r],
                "vec_b": all_ids[c],
                "cosine": cos[r, c],
            }
        )

    return emb_ds.map_batches(block, batch_format="pandas", batch_size=None)
