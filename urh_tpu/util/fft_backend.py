"""Host FFT backend shared by the DSP host twins.

scipy's pocketfft with all worker threads when available — and true
single-precision compute for complex64 rows, where np.fft silently
upcasts to complex128 and runs serially.  The np.fft fallback casts
back to the input precision so both branches keep the same dtype
contract (decision thresholds downstream compare float32-scale
statistics either way).
"""

from __future__ import annotations

import numpy as np


def fft_rows(x: np.ndarray, n: int = None, inverse: bool = False,
             axis: int = -1) -> np.ndarray:
    try:
        from scipy import fft as sfft

        fn = sfft.ifft if inverse else sfft.fft
        return fn(x, n, axis=axis, workers=-1)
    except ImportError:
        fn = np.fft.ifft if inverse else np.fft.fft
        out = fn(x, n, axis=axis)
        if np.dtype(x.dtype) == np.complex64:
            out = out.astype(np.complex64)
        return out
