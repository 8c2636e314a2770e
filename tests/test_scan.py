"""Distributed ordered prefix scan (pipelines/scan.py).

Contracts: (1) ordered_prefix_sum equals the sequential numpy cumsum at
any block layout / bucket count; (2) pack_sequences implements exact
concat-and-chunk semantics (pack boundaries every `budget` tokens in
doc_id order); (3) shuffle_rank is a permutation 0..n-1 equal to the
naive (hash, id) argsort, stable across parallelism and seed-sensitive.
"""

import numpy as np
import pandas as pd
import pytest

from light_curve_feature_ray.pipelines.sampling import lehmer_hash
from light_curve_feature_ray.pipelines.scan import (
    ordered_prefix_sum,
    pack_sequences,
    shuffle_rank,
)


def _frame(n=1000, seed=9):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64) * 3 + 11  # sparse, shuffled
    return pd.DataFrame(
        {"doc_id": ids, "v": rng.integers(0, 100, size=n).astype(np.int64)}
    )


def _ds(df, blocks):
    import ray.data as rd

    return rd.from_pandas([d for d in np.array_split(df, blocks) if len(d)])


@pytest.mark.parametrize("blocks,buckets", [(1, 4), (7, 16), (13, 256)])
def test_prefix_sum_matches_sequential(ray_session, blocks, buckets):
    df = _frame()
    out = (
        ordered_prefix_sum(
            _ds(df, blocks),
            order_cols=["doc_id"],
            value_col="v",
            num_buckets=buckets,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values("doc_id").reset_index(drop=True)
    expect = np.concatenate(([0], np.cumsum(ref["v"].to_numpy())[:-1]))
    assert np.array_equal(out["prefix"].to_numpy(), expect)
    assert np.array_equal(out["v"].to_numpy(), ref["v"].to_numpy())


def test_prefix_rank_mode_counts_rows(ray_session):
    df = _frame(300)
    out = (
        ordered_prefix_sum(
            _ds(df, 5), order_cols=["doc_id"], value_col=None, num_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert np.array_equal(
        out["prefix"].to_numpy(), np.arange(len(df), dtype=np.int64)
    )


def test_pack_sequences_concat_and_chunk(ray_session):
    import ray.data as rd

    texts = ["alpha beta", "", "one two three four", "x", "a b c d e f g"]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
    out = (
        pack_sequences(rd.from_pandas(df), budget=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = out["n_tokens"].to_numpy()
    assert toks.tolist() == [2, 0, 4, 1, 7]
    pre = np.concatenate(([0], np.cumsum(toks)[:-1]))
    assert np.array_equal(out["pack_id"].to_numpy(), pre // 4)
    assert np.array_equal(out["pack_offset"].to_numpy(), pre % 4)
    # the 7-token doc starts in pack 1 (offset 3) and straddles into pack 2+
    assert out.loc[4, "pack_id"] == 1 and out.loc[4, "pack_offset"] == 3

    with pytest.raises(ValueError):
        pack_sequences(rd.from_pandas(df), budget=0)


@pytest.mark.parametrize("blocks", [1, 6])
def test_shuffle_rank_is_hash_order_permutation(ray_session, blocks):
    df = _frame(500, seed=3)[["doc_id"]]
    out = (
        shuffle_rank(_ds(df, blocks), seed=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = np.sort(df["doc_id"].to_numpy())
    h = lehmer_hash(ids, seed=7)
    naive = np.empty(len(ids), dtype=np.int64)
    naive[np.lexsort((ids, h))] = np.arange(len(ids))
    assert np.array_equal(out["shuffle_rank"].to_numpy(), naive)
    assert np.array_equal(out["shuffle_h"].to_numpy(), h)
    # a permutation of 0..n-1
    assert np.array_equal(
        np.sort(out["shuffle_rank"].to_numpy()), np.arange(len(ids))
    )


def test_shuffle_rank_seed_changes_order(ray_session):
    df = _frame(200, seed=1)[["doc_id"]]
    a = shuffle_rank(_ds(df, 3), seed=0).to_pandas().sort_values("doc_id")
    b = shuffle_rank(_ds(df, 3), seed=1).to_pandas().sort_values("doc_id")
    assert not np.array_equal(
        a["shuffle_rank"].to_numpy(), b["shuffle_rank"].to_numpy()
    )


def test_monotone_int64_total_order():
    from light_curve_feature_ray.pipelines.scan import _monotone_int64

    v = np.array(
        [-np.inf, -1e300, -2.5, -0.0, 0.0, 1e-300, 3.7, np.inf, np.nan]
    )
    k = _monotone_int64(v)
    # strictly increasing except the -0.0/0.0 tie; NaN strictly last
    assert k[3] == k[4]
    rest = np.delete(k, 3)
    assert np.all(np.diff(rest) > 0)
    assert k[-1] == k.max()
    ints = np.array([-5, 0, 7], dtype=np.int64)
    assert _monotone_int64(ints) is ints


@pytest.mark.parametrize("blocks,buckets", [(3, 8), (9, 1024)])
def test_rank_and_ntile_match_sql_semantics(ray_session, blocks, buckets):
    from light_curve_feature_ray.pipelines.scan import global_ntile

    rng = np.random.default_rng(17)
    n = 403  # not divisible by k: exercises the NTILE remainder rule
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "value": np.round(rng.normal(size=n), 2),  # forces score ties
        }
    )
    df.loc[rng.random(n) < 0.03, "value"] = np.nan
    out = (
        global_ntile(
            _ds(df, blocks),
            order_cols=["value"],
            id_col="event_id",
            k=10,
            num_buckets=buckets,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # reference: NaN last, ties by event_id — numpy lexsort with NaN
    # mapped to +inf surrogate
    v = df["value"].to_numpy()
    vv = np.where(np.isnan(v), np.inf, v)
    nan_rank = np.where(np.isnan(v), 1, 0)
    order = np.lexsort((df["event_id"].to_numpy(), vv, nan_rank))
    ref_rank = np.empty(n, dtype=np.int64)
    ref_rank[order] = np.arange(n)
    assert np.array_equal(out["rank"].to_numpy(), ref_rank)
    # SQL NTILE: first n%k tiles one row larger
    size, rem = n // 10, n % 10
    ref_tile = np.where(
        ref_rank < rem * (size + 1),
        ref_rank // (size + 1) + 1,
        rem + (ref_rank - rem * (size + 1)) // size + 1,
    )
    assert np.array_equal(out["tile"].to_numpy(), ref_tile)
    with pytest.raises(ValueError):
        global_ntile(_ds(df, 2), order_cols=["value"], id_col="event_id", k=0)
