"""FFT-domain continuous Haar wavelet transform.

Used by modulation classification.  Same math as the reference
(urh/ainterpretation/Wavelet.py:7-43, after Torrence & Compo, "A
practical guide to wavelet analysis"): the CWT is computed as an
inverse FFT of the signal spectrum multiplied with the scaled wavelet
spectrum — a perfectly TPU-friendly formulation (batched FFTs).
"""

from __future__ import annotations

import numpy as np


def normalized_haar_wavelet(omega: np.ndarray, scale: int) -> np.ndarray:
    omega_scaled = omega / scale
    omega_scaled[0] = 1.0  # avoid division by zero; first element is zero anyway
    return (1j * np.square(-1 + np.exp(0.5j * omega))) / omega_scaled


def cwt_haar(x: np.ndarray, scale: int = 10) -> np.ndarray:
    """Continuous Haar wavelet transform of a 1-D complex signal."""
    next_power_two = 2 ** int(np.log2(len(x)))
    x = x[0:next_power_two]
    num_data = len(x)

    x_hat = np.fft.fft(x)

    f = 2.0 * np.pi / num_data
    omega = f * np.concatenate(
        (np.arange(0, num_data // 2), np.arange(num_data // 2, num_data) * -1)
    )

    psi_hat = np.sqrt(2.0 * np.pi * scale) * normalized_haar_wavelet(scale * omega, scale)

    w = np.fft.ifft(x_hat * psi_hat)
    return w[2 * scale : -2 * scale]
