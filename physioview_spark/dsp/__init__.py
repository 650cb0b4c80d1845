"""Pure-NumPy DSP kernel layer.

SciPy is not available in the engine's executor environment, so classical
IIR/FIR design (Butterworth, Chebyshev I/II, elliptic, notch, windowed-sinc
FIR) and filtering (causal + zero-phase) are implemented on NumPy alone.
Filtering is FFT-based — O(n log n), fully vectorized, the right execution
profile inside Arrow-batched ``applyInPandas`` kernels where a per-sample
Python recurrence would be 100x slower.

Design formulas follow the standard published analog prototypes
(e.g. Parks & Burrus, "Digital Filter Design"; Orfanidis' lecture notes on
elliptic filter design) — not any existing library's source.
"""

from physioview_spark.dsp.design import (
    butter, cheby1, cheby2, ellip, firwin, freqz, iirnotch,
)
from physioview_spark.dsp.apply import (
    fftconvolve, filtfilt_fft, hilbert, lfilter, lfilter_fft,
    moving_average, sliding_max,
)

__all__ = [
    "butter", "cheby1", "cheby2", "ellip", "firwin", "freqz", "iirnotch",
    "fftconvolve", "filtfilt_fft", "hilbert", "lfilter", "lfilter_fft",
    "moving_average", "sliding_max",
]
