"""FeatureExtractor: ordered fan-out of features over one series.

Analog of /root/reference/src/extractor.rs:26-57: aggregated info is the sum
of sizes / max of min lengths / OR of flags; ``eval`` concatenates
sub-results and fails whole if any sub-feature fails (:129-135) while
``eval_or_fill`` fills per-feature independently (:137-143).
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from .base import Feature, feature_from_config
from .kernel import Series


class FeatureExtractor:
    def __init__(self, features: Iterable[Feature]):
        self.features: list[Feature] = list(features)

    # -- aggregated EvaluatorInfo -------------------------------------------

    @property
    def size(self) -> int:
        return sum(f.size for f in self.features)

    @property
    def min_ts_length(self) -> int:
        return max((f.min_ts_length for f in self.features), default=0)

    @property
    def t_required(self) -> bool:
        return any(f.t_required for f in self.features)

    @property
    def m_required(self) -> bool:
        return any(f.m_required for f in self.features)

    @property
    def w_required(self) -> bool:
        return any(f.w_required for f in self.features)

    @property
    def sorting_required(self) -> bool:
        return any(f.sorting_required for f in self.features)

    @property
    def variability_required(self) -> bool:
        return any(f.variability_required for f in self.features)

    # -- names ---------------------------------------------------------------

    def names(self) -> list[str]:
        out: list[str] = []
        for f in self.features:
            out.extend(f.names)
        return out

    def descriptions(self) -> list[str]:
        out: list[str] = []
        for f in self.features:
            out.extend(f.descriptions)
        return out

    # -- evaluation ----------------------------------------------------------

    def eval(self, s: Series) -> np.ndarray:
        parts = [f.eval(s) for f in self.features]
        return np.concatenate(parts) if parts else np.empty(0)

    def eval_or_fill(self, s: Series, fill_value: float = np.nan) -> np.ndarray:
        parts = [f.eval_or_fill(s, fill_value) for f in self.features]
        return np.concatenate(parts) if parts else np.empty(0)

    # -- config --------------------------------------------------------------

    def to_config(self) -> list[dict[str, Any]]:
        return [f.to_dict() for f in self.features]

    @classmethod
    def from_config(cls, spec: Iterable[dict[str, Any] | str]) -> "FeatureExtractor":
        return cls(feature_from_config(item) for item in spec)

    def __repr__(self) -> str:
        return f"FeatureExtractor({self.features!r})"
