"""Driver-style correctness check: run every queries() entry and compare
against its oracle_sql() via DuckDB (row count, schema, order-insensitive
values). Usage: python scripts/check_oracle.py [sf_dir] [name ...]"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    # sort by non-float key columns first: float values can differ by one
    # ulp between engines, which must not reorder rows (floats still break
    # residual ties, harmless because such rows are then near-identical)
    keys = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    keys += [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    return df.sort_values(keys, kind="mergesort").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class the driver's hash canonicalization distinguishes:
    int-vs-float divergence between the engine and its oracle (e.g. DuckDB
    HUGEINT surfacing as float64) hash-mismatches even when every value is
    numerically identical — so it must fail here too."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    # dtype-kind parity BEFORE normalization (normalize() casts both sides
    # to common widths, which is exactly what masked the doc_pack driver
    # fail in round 4 — the driver hash is not dtype-blind)
    for c in sorted(set(ray_df.columns) & set(sql_df.columns)):
        ka, kb = _dtype_kind(ray_df[c]), _dtype_kind(sql_df[c])
        if ka != kb:
            problems.append(
                f"col {c}: dtype kind differs ray={ka}({ray_df[c].dtype}) "
                f"sql={kb}({sql_df[c].dtype}) — driver hash would mismatch"
            )
    if problems:
        return problems
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row counts differ: ray={len(a)} sql={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            na, nb = np.isnan(av), np.isnan(bv)
            if not (na == nb).all():
                problems.append(
                    f"col {c}: NaN mask differs ({int(na.sum())} vs {int(nb.sum())})"
                )
                continue
            if not np.allclose(av[~na], bv[~nb], rtol=1e-9, atol=1e-9):
                bad = np.flatnonzero(
                    ~np.isclose(av[~na], bv[~nb], rtol=1e-9, atol=1e-9)
                )
                problems.append(
                    f"col {c}: {len(bad)} value diffs, e.g. "
                    f"{av[~na][bad[:3]]} vs {bv[~nb][bad[:3]]}"
                )
        elif av.dtype.kind == "M":
            # datetime: NaT == NaT must count as equal (the driver's
            # hash compare goes through pandas where both sides are NaT)
            na, nb = pd.isna(av), pd.isna(bv)
            if not (na == nb).all():
                problems.append(
                    f"col {c}: NaT mask differs ({int(na.sum())} vs {int(nb.sum())})"
                )
                continue
            neq = av[~na] != bv[~nb]
            if neq.any():
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, e.g. "
                    f"{av[~na][neq][:3]} vs {bv[~nb][neq][:3]}"
                )
        else:
            neq = av != bv
            if neq.any():
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, e.g. "
                    f"{av[neq][:3]} vs {bv[neq][:3]}"
                )
    return problems


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: ray query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ray_df)} rows, cols={list(ray_df.columns)[:8]}")
            if len(ray_df) == 0 and name != "doc_minhash_dups":
                print(f"  WARNING: empty result")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"[FAIL] {name} ({len(ray_df)} rows):")
            for p in problems:
                print(f"   - {p}")
        else:
            print(f"[ok] {name}: {len(ray_df)} rows match")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
