"""Feature kernel: per-series evaluators, extractor, registry.

Import order matters: importing the submodules populates the registry.
"""

from .base import REGISTRY, Feature, feature_from_config, register  # noqa: F401
from .kernel import Series, fit_straight_line, ppf_r5  # noqa: F401
from .basic import *  # noqa: F401,F403
from .extractor import FeatureExtractor  # noqa: F401
from .transformers import Transformed, TRANSFORMERS  # noqa: F401
from .bins import Bins  # noqa: F401
from .periodogram_feature import Periodogram  # noqa: F401
from .nl_fit import BazinFit, LinexpFit, VillarFit  # noqa: F401
