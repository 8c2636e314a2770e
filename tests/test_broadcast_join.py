"""broadcast_join (pipelines/joins.py): shuffle-free dimension enrichment
— inner/left semantics vs pandas merge, key-type casting, and the
dimension-table contract guards (unique keys, collision, size bound)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _fact(n=500, n_keys=40, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            # keys 0..n_keys+9: the top 10 have no dimension row
            "k": rng.integers(0, n_keys + 10, n),
            "x": rng.uniform(0, 10, n),
        }
    )


def _dim(n_keys=40):
    return pa.table(
        {
            "dim_k": pa.array(np.arange(n_keys), type=pa.int32()),
            "name": [f"name_{i}" for i in range(n_keys)],
            "weight": np.arange(n_keys, dtype=np.float64) * 0.5,
        }
    )


def _run(ray_session, how, **kw):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import broadcast_join

    fact = _fact()
    out = (
        broadcast_join(
            rd.from_pandas(fact).repartition(7),
            _dim(),
            left_on="k",
            right_on="dim_k",
            how=how,
            **kw,
        )
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    exp = fact.merge(
        _dim().to_pandas(), left_on="k", right_on="dim_k", how=how
    ).drop(columns="dim_k")
    exp = exp.sort_values("row_id").reset_index(drop=True)
    return out, exp


def test_inner_matches_pandas(ray_session):
    out, exp = _run(ray_session, "inner")
    assert list(out.columns) == ["row_id", "k", "x", "name", "weight"]
    assert len(out) == len(exp) < 500  # some keys really are unmatched
    assert (out["row_id"].to_numpy() == exp["row_id"].to_numpy()).all()
    assert (out["name"].to_numpy() == exp["name"].to_numpy()).all()
    np.testing.assert_array_equal(out["weight"], exp["weight"])


def test_left_keeps_unmatched_with_nulls(ray_session):
    out, exp = _run(ray_session, "left")
    assert len(out) == 500
    miss = out["name"].isna()
    assert miss.any() and (miss == exp["name"].isna()).all()
    np.testing.assert_array_equal(
        out.loc[~miss, "weight"].to_numpy(), exp.loc[~miss, "weight"].to_numpy()
    )
    assert out.loc[miss, "weight"].isna().all()


def test_parallelism_invariance(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import broadcast_join

    fact = _fact()
    outs = [
        broadcast_join(
            rd.from_pandas(fact).repartition(p),
            _dim(),
            left_on="k",
            right_on="dim_k",
        )
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
        for p in (1, 11)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_right_dataset_and_guards(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import broadcast_join

    fact = rd.from_pandas(_fact())
    # Dataset right side materializes under the bound, preserving types
    out = broadcast_join(
        fact, rd.from_arrow(_dim()), left_on="k", right_on="dim_k"
    ).to_pandas()
    assert {"name", "weight"} <= set(out.columns)

    with pytest.raises(ValueError, match="max_broadcast"):
        broadcast_join(
            fact, rd.from_arrow(_dim()), left_on="k", right_on="dim_k",
            max_broadcast=10,
        )
    dup = pa.table({"dim_k": [1, 1], "name": ["a", "b"]})
    with pytest.raises(ValueError, match="unique"):
        broadcast_join(fact, dup, left_on="k", right_on="dim_k")
    clash = pa.table({"dim_k": [1], "x": [2.0]})
    with pytest.raises(ValueError, match="collision"):
        broadcast_join(fact, clash, left_on="k", right_on="dim_k")


def test_broadcast_semi_and_anti_join(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import broadcast_semi_join

    left = pd.DataFrame(
        {
            "row_id": np.arange(6, dtype=np.int64),
            "k": pd.array([1, 2, 3, None, 2, 9], dtype="Int64"),
        }
    )
    # duplicate right keys are legal for membership (unlike broadcast_join)
    right = pa.table({"k": pa.array([2, 3, 3, None], type=pa.int64())})
    fact = rd.from_pandas(left)

    semi = broadcast_semi_join(fact, right, left_on="k").to_pandas()
    assert sorted(semi["row_id"]) == [1, 2, 4]  # null key dropped (SQL IN)

    anti = broadcast_semi_join(fact, right, left_on="k", anti=True).to_pandas()
    # left-anti keeps null-keyed rows ("no match")
    assert sorted(anti["row_id"]) == [0, 3, 5]

    # semi + anti partition the input
    assert len(semi) + len(anti) == len(left)

    with pytest.raises(ValueError, match="max_broadcast"):
        broadcast_semi_join(fact, rd.from_arrow(right), left_on="k",
                            max_broadcast=2)


def test_broadcast_semi_join_dataset_right_and_invariance(ray_session):
    import ray.data as rd

    from light_curve_feature_ray.pipelines.joins import broadcast_semi_join

    rng = np.random.default_rng(4)
    left = pd.DataFrame(
        {
            "row_id": np.arange(500, dtype=np.int64),
            "k": rng.integers(0, 40, size=500).astype(np.int64),
        }
    )
    keep = pd.DataFrame({"k": np.arange(0, 40, 3, dtype=np.int64)})
    expect = sorted(left.loc[left["k"].isin(keep["k"]), "row_id"])
    for parts in (1, 7):
        blocks = [b for b in np.array_split(left, parts) if len(b)]
        out = broadcast_semi_join(
            rd.from_pandas(blocks), rd.from_pandas(keep), left_on="k"
        ).to_pandas()
        assert sorted(out["row_id"]) == expect
