"""Transformers + the Transformed meta-feature.

Analog of /root/reference/src/transformers/mod.rs:102-138 (elementwise
Identity / Arcsinh / Ln1p / Lg / Sqrt), clipped_lg.rs:34-41 (ClippedLg) and
/root/reference/src/features/transformed.rs:114-122 (Transformed wrapper:
post-transform of a feature's output vector, names prefixed).
"""

from __future__ import annotations

import sys
from typing import Any

import numpy as np

from .base import Feature, feature_from_config, register
from .kernel import Series


class Transformer:
    kind: str = ""

    def transform(self, v: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def names(self, names: list[str]) -> list[str]:
        raise NotImplementedError

    def size_of(self, input_size: int) -> int:
        return input_size

    def to_dict(self) -> dict[str, Any]:
        return {"name": self.kind}


class Identity(Transformer):
    kind = "identity"

    def transform(self, v):
        return v

    def names(self, names):
        return list(names)


class _Elementwise(Transformer):
    prefix = ""
    fn = None

    def transform(self, v):
        return type(self).fn(v)

    def names(self, names):
        return [f"{self.prefix}_{n}" for n in names]


class Arcsinh(_Elementwise):
    kind = "arcsinh"
    prefix = "arcsinh"
    fn = staticmethod(np.arcsinh)


class Ln1p(_Elementwise):
    kind = "ln1p"
    prefix = "ln1p"
    fn = staticmethod(np.log1p)


class Lg(_Elementwise):
    kind = "lg"
    prefix = "lg"
    fn = staticmethod(np.log10)


class Sqrt(_Elementwise):
    kind = "sqrt"
    prefix = "sqrt"
    fn = staticmethod(np.sqrt)


class ClippedLg(Transformer):
    """log10 clipped at the smallest positive normal float —
    /root/reference/src/transformers/clipped_lg.rs:34-41."""

    kind = "clipped_lg"

    def __init__(self, min_value: float | None = None):
        self.min_value = (
            float(min_value)
            if min_value is not None
            else np.log10(sys.float_info.min)
        )

    def transform(self, v):
        v = np.asarray(v, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(v < sys.float_info.min, self.min_value, np.log10(v))
        return out

    def names(self, names):
        return [f"clipped_lg_{n}" for n in names]

    def to_dict(self):
        return {"name": self.kind, "min_value": self.min_value}


class Composed(Transformer):
    """Transformers stacked over consecutive chunks of the input vector —
    /root/reference/src/transformers/composed.rs:22-66: a list of
    (transformer, input_size) pairs consuming the feature vector in order."""

    kind = "composed"

    def __init__(self, transformers):
        self.parts: list[tuple[Transformer, int]] = []
        for item in transformers:
            if isinstance(item, (list, tuple)):
                spec, size = item
            else:
                spec, size = item, 1
            tr = (
                spec
                if isinstance(spec, Transformer)
                else transformer_from_config(spec)
            )
            self.parts.append((tr, int(size)))

    @property
    def input_size(self) -> int:
        return sum(size for _, size in self.parts)

    def size_of(self, input_size: int) -> int:
        assert input_size == self.input_size, "composed size mismatch"
        return sum(tr.size_of(size) for tr, size in self.parts)

    def transform(self, v):
        out, pos = [], 0
        for tr, size in self.parts:
            out.append(np.asarray(tr.transform(v[pos : pos + size])))
            pos += size
        return np.concatenate(out) if out else np.empty(0)

    def names(self, names):
        out, pos = [], 0
        for tr, size in self.parts:
            out.extend(tr.names(list(names[pos : pos + size])))
            pos += size
        return out

    def to_dict(self):
        return {
            "name": self.kind,
            "transformers": [[tr.to_dict(), size] for tr, size in self.parts],
        }


class _FitTransformer(Transformer):
    """Shared shape of the fit-output reshapers
    (/root/reference/src/transformers/transformer.rs:37-48): consume a fit
    feature's full output vector, emit magnitude-space summaries —
    mag full amplitude = zp - 2.5*log10(2A), baseline/amplitude ratio,
    the kept time-scale params, and ln1p(reduced_chi2)."""

    #: expected input size; output names (fixed, independent of input names)
    INPUT_SIZE: int = 0
    OUT_NAMES: tuple = ()

    def __init__(self, mag_zp: float = 8.9):
        # ZP for AB magnitudes with fluxes in janskys
        # (/root/reference/src/transformers/bazin_fit.rs:40-42)
        self.mag_zp = float(mag_zp)

    def size_of(self, input_size: int) -> int:
        assert input_size == self.INPUT_SIZE, (
            f"{self.kind}: expected {self.INPUT_SIZE} features, got {input_size}"
        )
        return len(self.OUT_NAMES)

    def names(self, names):
        assert len(names) == self.INPUT_SIZE, (self.kind, names)
        return list(self.OUT_NAMES)

    def to_dict(self):
        return {"name": self.kind, "mag_zp": self.mag_zp}

    def _mag_amplitude(self, amplitude):
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.mag_zp - 2.5 * np.log10(2.0 * amplitude)


class BazinFitTransformer(_FitTransformer):
    """6 -> 5 reshape of BazinFit output —
    /root/reference/src/transformers/bazin_fit.rs:97-126."""

    kind = "bazin_fit"
    INPUT_SIZE = 6
    OUT_NAMES = (
        "bazin_fit_mag_full_amplitude",
        "bazin_fit_baseline_amplitude_ratio",
        "bazin_fit_rise_time",
        "bazin_fit_fall_time",
        "ln1p_bazin_fit_reduced_chi2",
    )

    def transform(self, v):
        amplitude, baseline, _t0, rise, fall, rchi2 = np.asarray(v, dtype=np.float64)
        return np.array(
            [
                self._mag_amplitude(amplitude),
                baseline / amplitude,
                rise,
                fall,
                np.log1p(rchi2),
            ]
        )


class VillarFitTransformer(_FitTransformer):
    """8 -> 7 reshape of VillarFit output —
    /root/reference/src/transformers/villar_fit.rs:102-137."""

    kind = "villar_fit"
    INPUT_SIZE = 8
    OUT_NAMES = (
        "villar_fit_mag_full_amplitude",
        "villar_fit_baseline_amplitude_ratio",
        "villar_fit_rise_time",
        "villar_fit_fall_time",
        "villar_fit_plateau_rel_amplitude",
        "villar_fit_plateau_duration",
        "ln1p_villar_fit_reduced_chi2",
    )

    def transform(self, v):
        (
            amplitude,
            baseline,
            _t0,
            rise,
            fall,
            nu,
            gamma,
            rchi2,
        ) = np.asarray(v, dtype=np.float64)
        return np.array(
            [
                self._mag_amplitude(amplitude),
                baseline / amplitude,
                rise,
                fall,
                nu,
                gamma,
                np.log1p(rchi2),
            ]
        )


class LinexpFitTransformer(_FitTransformer):
    """5 -> 4 reshape of LinexpFit output —
    /root/reference/src/transformers/linexp_fit.rs:93-122 (note the
    reference's output order: amplitude, fall_time, baseline_ratio,
    ln1p_chi2 — replicated)."""

    kind = "linexp_fit"
    INPUT_SIZE = 5
    OUT_NAMES = (
        "linexp_fit_amplitude",
        "linexp_fit_fall_time",
        "linexp_fit_baseline",
        "ln1p_linexp_fit_reduced_chi2",
    )

    def transform(self, v):
        amplitude, _t0, fall, baseline, rchi2 = np.asarray(v, dtype=np.float64)
        return np.array(
            [
                self._mag_amplitude(amplitude),
                fall,
                baseline / amplitude,
                np.log1p(rchi2),
            ]
        )


TRANSFORMERS: dict[str, type] = {
    c.kind: c
    for c in (
        Identity,
        Arcsinh,
        Ln1p,
        Lg,
        Sqrt,
        ClippedLg,
        Composed,
        BazinFitTransformer,
        VillarFitTransformer,
        LinexpFitTransformer,
    )
}


def transformer_from_config(spec: dict[str, Any] | str) -> Transformer:
    if isinstance(spec, str):
        return TRANSFORMERS[spec]()
    spec = dict(spec)
    kind = spec.pop("name")
    return TRANSFORMERS[kind](**spec)


@register
class Transformed(Feature):
    """Wraps a feature and post-transforms its output vector —
    /root/reference/src/features/transformed.rs:114-122."""

    kind = "transformed"

    def __init__(self, feature, transformer):
        self.feature = (
            feature if isinstance(feature, Feature) else feature_from_config(feature)
        )
        self.transformer = (
            transformer
            if isinstance(transformer, Transformer)
            else transformer_from_config(transformer)
        )

    @property
    def size(self):
        return self.transformer.size_of(self.feature.size)

    @property
    def min_ts_length(self):
        return self.feature.min_ts_length

    @property
    def t_required(self):
        return self.feature.t_required

    @property
    def m_required(self):
        return self.feature.m_required

    @property
    def w_required(self):
        return self.feature.w_required

    @property
    def sorting_required(self):
        return self.feature.sorting_required

    @property
    def variability_required(self):
        return self.feature.variability_required

    @property
    def names(self):
        return self.transformer.names(self.feature.names)

    def check(self, s: Series):
        self.feature.check(s)

    def _eval(self, s: Series):
        return self.transformer.transform(self.feature.eval(s))

    def _params(self):
        return {
            "feature": self.feature.to_dict(),
            "transformer": self.transformer.to_dict(),
        }
