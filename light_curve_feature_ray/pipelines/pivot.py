"""Pivot (long -> wide conditional aggregation) the Ray-Data way.

``pivot_agg`` turns one row per (key, category, value) into one row per
key with ``n_<cat>`` / ``sum_<cat>`` columns — SQL's
``sum(CASE WHEN category = c THEN ...)`` spelling, the standard feature-
engineering step before a model join.

Shape: a block-local COMBINER builds the wide partial per key inside each
batch (one pandas groupby over the batch — no shuffle of raw rows), then
Ray Data's native ``groupby(key).sum([...])`` reduces the wide partials;
the exchange carries one wide row per (key, block).  Categories are an
explicit, driver-known list (the dimension contract — same as
``stratified_hash_sample``'s rates dict): unknown categories land in the
``_other`` bucket rather than silently minting columns, so the output
schema is fixed and partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pivot_agg(
    ds,
    *,
    key_col: str,
    pivot_col: str,
    value_col: str,
    categories: list[str],
    other: str = "_other",
):
    """One output row per ``key_col``: for each category ``c`` in
    ``categories`` (plus the ``other`` catch-all), ``n_<c>`` = count of
    NON-NULL values and ``sum_<c>`` = their sum (NaN when the count is 0,
    i.e. SQL NULL).  Column order is deterministic."""
    cats = list(categories)
    if len(set(cats)) != len(cats):
        raise ValueError(f"duplicate categories: {cats}")
    all_cats = cats + [other]
    n_cols = [f"n_{c}" for c in all_cats]
    s_cols = [f"sum_{c}" for c in all_cats]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = pd.DataFrame({key_col: b[key_col]})
            for nc, sc in zip(n_cols, s_cols):
                out[nc] = np.empty(0, dtype=np.int64)
                out[sc] = np.empty(0, dtype=np.float64)
            return out
        k = b[key_col].to_numpy()
        cat = pd.Categorical(
            b[pivot_col], categories=cats
        ).codes.astype(np.int64)  # -1 == not in list -> the _other slot
        cat = np.where(cat < 0, len(cats), cat)
        v = b[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        # one lexsort + reduceat per batch: no per-key Python
        order = np.lexsort((cat, k))
        k, cat, v, ok = k[order], cat[order], v[order], ok[order]
        new = np.r_[True, k[1:] != k[:-1]]
        gid = np.cumsum(new) - 1
        ngroups = int(gid[-1]) + 1 if len(k) else 0
        width = len(all_cats)
        slot = gid * width + cat
        n_mat = np.zeros(ngroups * width, dtype=np.int64)
        np.add.at(n_mat, slot[ok], 1)
        s_mat = np.zeros(ngroups * width, dtype=np.float64)
        np.add.at(s_mat, slot[ok], v[ok])
        out = pd.DataFrame({key_col: k[new]})
        n_mat = n_mat.reshape(ngroups, width)
        s_mat = s_mat.reshape(ngroups, width)
        for j, c in enumerate(all_cats):
            out[f"n_{c}"] = n_mat[:, j]
            out[f"sum_{c}"] = s_mat[:, j]
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    reduced = partials.groupby(key_col).sum(n_cols + s_cols)

    def finish(b: pd.DataFrame):
        import pyarrow as pa

        # emit Arrow with EXPLICIT float64 types: Ray converts a pandas
        # block whose float column is all-NaN to Arrow `null` type, which
        # then poisons the unified schema (e.g. an always-empty _other
        # bucket)
        cols = {key_col: pa.array(b[key_col].to_numpy())}
        for c in all_cats:
            n = b[f"sum(n_{c})"].to_numpy(dtype=np.int64)
            s = b[f"sum(sum_{c})"].to_numpy(dtype=np.float64)
            cols[f"n_{c}"] = pa.array(n, type=pa.int64())
            cols[f"sum_{c}"] = pa.array(
                np.where(n > 0, s, np.nan), type=pa.float64()
            )  # SQL NULL sum
        return pa.table(cols)

    return reduced.map_batches(finish, batch_format="pandas", batch_size=None)


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            name_col: str = "name", value_col: str = "value"):
    """Wide -> long (SQL UNPIVOT / pandas melt), the inverse of
    :func:`pivot_agg`: each input row explodes into one row per entry of
    ``value_cols``, carrying ``id_cols`` through plus (name, value).
    Values are cast to float64 (the common-type contract of a single
    long value column). NULL values are preserved as NaN rows — use a
    filter afterwards for SQL's default EXCLUDE NULLS behavior.

    Pure per-block 1->N map (np.repeat/tile) — no shuffle, trivially
    partition-invariant.
    """
    import pyarrow as pa

    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        m = len(value_cols)
        idx = np.repeat(np.arange(n, dtype=np.int64), m)
        out = {}
        for c in id_cols:
            out[c] = batch[c].take(pa.array(idx))
        out[name_col] = pa.array(np.tile(np.array(value_cols), n))
        vals = np.empty((n, m), dtype=np.float64)
        for j, c in enumerate(value_cols):
            vals[:, j] = (
                batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            )
        out[value_col] = pa.array(vals.ravel())
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)
