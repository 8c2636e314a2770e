"""Feature base class, metadata and registry.

The analog of the reference's ``EvaluatorInfo`` + ``FeatureEvaluator`` traits
(/root/reference/src/evaluator.rs:15-23, :74-108) and the serde-JSON feature
config surface (/root/reference/src/feature.rs:18-68): a feature pipeline is
data — a list of ``{"name": ..., **params}`` dicts builds the extractor.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from ..errors import EvaluatorError, FlatTimeSeries, ShortTimeSeries
from .kernel import Series


def number_ending(i: int) -> str:
    """Ordinal suffix for a number ("st"/"nd"/"rd"/"th") — the analog of
    /root/reference/src/number_ending.rs (used by feature descriptions,
    e.g. "period of the 2nd highest peak")."""
    if i % 100 in (11, 12, 13):
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(i % 10, "th")


class Feature:
    """Base evaluator: ``eval(series) -> np.ndarray`` of length ``size``."""

    # EvaluatorInfo flags — subclasses override as needed
    size: int = 1
    min_ts_length: int = 1
    t_required: bool = False
    m_required: bool = True
    w_required: bool = False
    sorting_required: bool = False
    variability_required: bool = False

    # registry key (snake_case class identifier used in JSON config)
    kind: str = ""

    @property
    def names(self) -> list[str]:
        raise NotImplementedError

    @property
    def descriptions(self) -> list[str]:
        return list(self.names)

    # -- evaluation ----------------------------------------------------------

    def check(self, s: Series) -> None:
        """Input validation, mirroring ``check_ts``
        (/root/reference/src/evaluator.rs:74-108)."""
        if s.n < self.min_ts_length:
            raise ShortTimeSeries(s.n, self.min_ts_length)
        if self.variability_required and s.is_all_same("m"):
            raise FlatTimeSeries()

    def _eval(self, s: Series) -> np.ndarray:
        raise NotImplementedError

    def eval(self, s: Series) -> np.ndarray:
        self.check(s)
        out = np.asarray(self._eval(s), dtype=np.float64)
        assert out.shape == (self.size,), (self.kind, out.shape)
        return out

    def eval_or_fill(self, s: Series, fill_value: float = np.nan) -> np.ndarray:
        """Total-function variant (/root/reference/src/evaluator.rs:144-149)."""
        try:
            return self.eval(s)
        except EvaluatorError:
            return np.full(self.size, fill_value, dtype=np.float64)

    # -- config (serde analog) -----------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        return {"name": self.kind, **self._params()}

    def _params(self) -> dict[str, Any]:
        return {}

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Feature":
        d = dict(d)
        kind = d.pop("name")
        return REGISTRY[kind](**d)

    def __repr__(self) -> str:
        params = ", ".join(f"{k}={v!r}" for k, v in self._params().items())
        return f"{type(self).__name__}({params})"


REGISTRY: dict[str, Callable[..., Feature]] = {}


def register(cls):
    """Class decorator adding the feature to the global registry."""
    assert cls.kind, cls
    REGISTRY[cls.kind] = cls
    return cls


def feature_from_config(spec: dict[str, Any] | str) -> Feature:
    """Build a feature from a JSON-able spec (str = default-constructed)."""
    if isinstance(spec, str):
        return REGISTRY[spec]()
    return Feature.from_dict(spec)
