"""Multicolor (cross-band) features: color differences + spread.

Analog of /root/reference/src/multicolor/features/ — passband -> our band
column (role / tool / event_type):

- color_median_{a}_{b} = median_a(m) - median_b(m) (color_of_median.rs)
- color_max_{a}_{b}    = max_a(m) - max_b(m)       (color_of_maximum.rs)
- color_min_{a}_{b}    = min_a(m) - min_b(m)       (color_of_minimum.rs)
- color_spread         = POPULATION std of the per-band weighted means over
  the configured band set (color_spread.rs:13-27)

A conversation missing any configured band yields nulls (the reference's
missing-passband error, as a fill).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

def conv_color_features(turns_ds, band_a: str, band_b: str, band_set=None):
    """Dataset of per-conv color features (see color_features)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    band_set = sorted(set(band_set or (band_a, band_b)))

    # per-(conv, band) aggregates in one pass
    def banded_aggs(batch: pa.Table) -> pa.Table:
        import numpy as np

        conv_dict = batch["conv_id"].combine_chunks().dictionary_encode()
        codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        band_dict = batch["role"].combine_chunks().dictionary_encode()
        bands = band_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        m = (
            pc.cast(
                pc.fill_null(
                    pc.utf8_length(batch["text"].combine_chunks()), 0
                ),
                pa.float64(),
            ).to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((m, bands, codes))
        c, b, mm = codes[order], bands[order], m[order]
        starts = np.flatnonzero(np.r_[True, (c[1:] != c[:-1]) | (b[1:] != b[:-1])])
        ends = np.r_[starts[1:], c.shape[0]]
        n = (ends - starts).astype(np.int64)
        # m sorted within segment (lexsort key): median via mid elements
        lo = starts + (n - 1) // 2
        hi = starts + n // 2
        med = 0.5 * (mm[lo] + mm[hi])
        sums = np.add.reduceat(mm, starts)
        return pa.table(
            {
                "conv_id": pa.DictionaryArray.from_arrays(
                    pa.array(c[starts], type=pa.int32()), conv_dict.dictionary
                ).cast(pa.string()),
                "band": pa.DictionaryArray.from_arrays(
                    pa.array(b[starts], type=pa.int32()), band_dict.dictionary
                ).cast(pa.string()),
                "median": pa.array(med, type=pa.float64()),
                "max_m": pa.array(mm[ends - 1], type=pa.float64()),
                "min_m": pa.array(mm[starts], type=pa.float64()),
                "wmean": pa.array(sums / n, type=pa.float64()),
            }
        )

    banded = turns_ds.groupby("part").map_groups(
        banded_aggs, batch_format="pyarrow"
    )

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        conv = g["conv_id"].iloc[0]
        by_band = g.drop_duplicates("band").set_index("band")
        out = {
            "conv_id": conv,
            f"color_median_{band_a}_{band_b}": np.nan,
            f"color_max_{band_a}_{band_b}": np.nan,
            f"color_min_{band_a}_{band_b}": np.nan,
            "color_spread": np.nan,
        }
        if band_a in by_band.index and band_b in by_band.index:
            out[f"color_median_{band_a}_{band_b}"] = (
                by_band.loc[band_a, "median"] - by_band.loc[band_b, "median"]
            )
            out[f"color_max_{band_a}_{band_b}"] = (
                by_band.loc[band_a, "max_m"] - by_band.loc[band_b, "max_m"]
            )
            out[f"color_min_{band_a}_{band_b}"] = (
                by_band.loc[band_a, "min_m"] - by_band.loc[band_b, "min_m"]
            )
        if all(bb in by_band.index for bb in band_set):
            mus = by_band.loc[band_set, "wmean"].to_numpy(dtype=float)
            out["color_spread"] = float(np.std(mus))
        return pd.DataFrame([out])

    return banded.groupby("conv_id").map_groups(pivot, batch_format="pandas")
