"""light_curve_feature_ray — a Ray-Data-native time-series rollup engine.

A from-scratch engine with the query/data-processing capabilities of the
``light-curve-feature`` Rust crate (reference at /root/reference), built on
ray.data.Dataset + Arrow batches: per-conversation turn streams are treated
as light curves, the full evaluator suite runs as continuous aggregates over
1m/1h/1d tumbling retention tiers with gap-fill and Gorilla-compressed raw
points, driven by one hash shuffle on conv_id with hot-key salting.
"""

__version__ = "0.1.0"

from .errors import (  # noqa: F401
    EvaluatorError,
    FlatTimeSeries,
    ShortTimeSeries,
    ZeroDivision,
)
from .features import (  # noqa: F401
    REGISTRY,
    Bins,
    Feature,
    FeatureExtractor,
    Periodogram,
    Series,
)
