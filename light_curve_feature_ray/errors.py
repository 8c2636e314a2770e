"""Evaluator error model.

Mirrors the reference's typed error enum (``EvaluatorError``,
/root/reference/src/error.rs:10-22): a feature evaluation either succeeds or
raises one of these; ``eval_or_fill`` converts failures into fill values
(NaN by default), matching /root/reference/src/evaluator.rs:144-149.
"""

from __future__ import annotations


class EvaluatorError(Exception):
    """Base class for feature-evaluation failures."""


class ShortTimeSeries(EvaluatorError):
    """Series shorter than the feature's ``min_ts_length``."""

    def __init__(self, actual: int, minimum: int):
        self.actual = actual
        self.minimum = minimum
        super().__init__(f"series length {actual} < required {minimum}")


class FlatTimeSeries(EvaluatorError):
    """All values equal while the feature requires variability."""

    def __init__(self) -> None:
        super().__init__("time series is flat (all values equal)")


class ZeroDivision(EvaluatorError):
    """A feature-specific division by zero (e.g. zero median denominator)."""

    def __init__(self, what: str = "") -> None:
        super().__init__(f"zero division: {what}")
