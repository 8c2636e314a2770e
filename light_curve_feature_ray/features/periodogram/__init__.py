from .freq import (  # noqa: F401
    ArbitraryFreqGrid,
    DynamicFreqParams,
    FreqGrid,
    LinearFreqGrid,
    NyquistFreq,
    ZeroBasedPow2FreqGrid,
)
from .power import FftPowerEvaluator, power_direct, power_fft  # noqa: F401
