"""STFT spectrogram.

Counterpart of urh/signalprocessing/Spectrogram.py: short-time Fourier
transform with configurable window/overlap, dB conversion
(util.pyx:38-48), fftshift + flip for display, `.fta` export and BGRA
image rendering.  The STFT is a frames-gather plus one batched FFT —
exactly the shape TPUs want; it runs on device via jnp.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from urh_tpu.core.iq import IQData
from urh_tpu.core.xfer import to_device, to_host


def _window(window_kind: str, window_size: int):
    if window_kind == "hanning":
        return jnp.hanning(window_size)
    if window_kind == "hamming":
        return jnp.hamming(window_size)
    if window_kind == "blackman":
        return jnp.blackman(window_size)
    return jnp.ones(window_size)


@partial(jax.jit, static_argnames=("window_size", "hop_size", "num_frames", "window_kind"))
def _stft_device(samples: jax.Array, window_size: int, hop_size: int,
                 num_frames: int, window_kind: str):
    window = _window(window_kind, window_size)
    idx = jnp.arange(num_frames)[:, None] * hop_size + jnp.arange(window_size)[None, :]
    frames = samples[idx]
    return jnp.fft.fft(frames * window, window_size, axis=1) / window_size


@partial(jax.jit, static_argnames=("window_size", "hop_size", "num_frames", "window_kind"))
def _stft_db_device(re: jax.Array, im: jax.Array, window_size: int, hop_size: int,
                    num_frames: int, window_kind: str):
    """Fused STFT -> fftshift -> dB: float planes in, float dB image out.

    Only float32 ever crosses the host/device boundary, and the complex
    STFT frames never round-trip to the host between shift and dB (the
    reference shuttles the full complex spectrogram twice,
    Spectrogram.py:68-79).
    """
    spec = _stft_device(jax.lax.complex(re, im), window_size, hop_size,
                        num_frames, window_kind)
    power = spec.real * spec.real + spec.imag * spec.imag
    db = (10.0 * jnp.log10(power)).astype(jnp.float32)
    return jnp.fft.fftshift(db, axes=1)


@jax.jit
def arr2decibel(arr: jax.Array) -> jax.Array:
    """10*log10 power (util.pyx:38-48)."""
    power = arr.real * arr.real + arr.imag * arr.imag
    return (10.0 * jnp.log10(power)).astype(jnp.float32)


class Spectrogram:
    MAX_LINES_PER_VIEW = 1000
    DEFAULT_FFT_WINDOW_SIZE = 1024

    def __init__(self, samples, window_size=DEFAULT_FFT_WINDOW_SIZE,
                 overlap_factor=0.5, window_function="hanning"):
        self._samples = np.zeros(1, dtype=np.complex64)
        self.samples = samples
        self.window_size = window_size
        self.overlap_factor = overlap_factor
        self.window_function = window_function
        self.data_min, self.data_max = -140, 10

    @property
    def samples(self):
        return self._samples

    @samples.setter
    def samples(self, value):
        if isinstance(value, IQData):
            value = value.as_complex64()
        elif isinstance(value, np.ndarray) and value.dtype != np.complex64:
            value = IQData(value).as_complex64()
        elif value is None:
            value = np.zeros(1, dtype=np.complex64)
        self._samples = value

    @property
    def time_bins(self):
        return int(math.ceil(len(self.samples) / self.hop_size))

    @property
    def freq_bins(self):
        return self.window_size

    @property
    def hop_size(self):
        return self.window_size - int(self.overlap_factor * self.window_size)

    def _frame_params(self, samples: np.ndarray):
        hop_size = self.hop_size
        if len(samples) < self.window_size:
            samples = np.append(
                samples, np.zeros(self.window_size - len(samples), dtype=samples.dtype)
            )
        num_frames = max(1, (len(samples) - self.window_size) // hop_size + 1)
        wf = self.window_function if isinstance(self.window_function, str) else "hanning"
        return samples, hop_size, num_frames, wf

    def stft(self, samples: np.ndarray) -> np.ndarray:
        samples, hop_size, num_frames, wf = self._frame_params(samples)
        out = _stft_device(to_device(samples), self.window_size, hop_size,
                           num_frames, wf)
        return to_host(out)

    @staticmethod
    def _stft_db_np(samples: np.ndarray, window_size: int, hop_size: int,
                    num_frames: int, window_kind: str) -> np.ndarray:
        """Host twin of _stft_db_device (float32 math, same output)."""
        window = np.asarray(
            {"hanning": np.hanning, "hamming": np.hamming,
             "blackman": np.blackman}.get(window_kind, np.ones)(window_size),
            dtype=np.float32)
        frames = np.lib.stride_tricks.sliding_window_view(
            samples, window_size)[::hop_size][:num_frames]
        from urh_tpu.util.fft_backend import fft_rows

        # threaded single-precision FFT (np.fft upcasts + is serial)
        spec = fft_rows((frames * window).astype(np.complex64),
                        window_size, axis=1) / np.float32(window_size)
        power = (spec.real * spec.real + spec.imag * spec.imag)
        with np.errstate(divide="ignore"):
            db = (10.0 * np.log10(power)).astype(np.float32)
        return np.fft.fftshift(db, axes=1)

    def _calculate_spectrogram(self, samples: np.ndarray) -> np.ndarray:
        samples, hop_size, num_frames, wf = self._frame_params(samples)
        samples = np.asarray(samples, dtype=np.complex64)

        # placement: the dB image (4 B/cell) plus the sample upload must
        # beat the host FFT (~10 ns/cell) for the device to pay off —
        # on a bandwidth-limited relay, interactive rendering stays host
        from urh_tpu.util.placement import device_io_cost_s

        cells = num_frames * self.window_size
        if device_io_cost_s(8 * len(samples), 4 * cells) > cells * 10e-9:
            return np.fliplr(self._stft_db_np(samples, self.window_size,
                                              hop_size, num_frames, wf))

        re = jnp.asarray(np.ascontiguousarray(samples.real))
        im = jnp.asarray(np.ascontiguousarray(samples.imag))
        spectrogram = np.asarray(_stft_db_device(re, im, self.window_size,
                                                 hop_size, num_frames, wf))
        return np.fliplr(spectrogram)  # Y axis from negative to positive freq

    def export_to_fta(self, sample_rate, filename: str, include_amplitude=False):
        """Frequency (f64), Time in ns (u32)[, Amplitude (f32)] export."""
        spectrogram = self._calculate_spectrogram(self.samples)
        spectrogram = np.flipud(spectrogram.T)
        if include_amplitude:
            result = np.empty((spectrogram.shape[0], spectrogram.shape[1], 3),
                              dtype=[("f", np.float64), ("t", np.uint32), ("a", np.float32)])
        else:
            result = np.empty((spectrogram.shape[0], spectrogram.shape[1], 2),
                              dtype=[("f", np.float64), ("t", np.uint32)])

        fft_freqs = np.fft.fftshift(np.fft.fftfreq(spectrogram.shape[0], 1 / sample_rate))
        time_width = 1e9 * ((len(self.samples) / sample_rate) / spectrogram.shape[1])

        for i in range(spectrogram.shape[0]):
            for j in range(spectrogram.shape[1]):
                if include_amplitude:
                    result[i, j] = (fft_freqs[i], int(j * time_width), spectrogram[i, j])
                else:
                    result[i, j] = (fft_freqs[i], int(j * time_width))
        result.tofile(filename)

    def create_spectrogram_image(self, sample_start=None, sample_end=None, step=None,
                                 transpose=False) -> np.ndarray:
        from urh_tpu.util import colormaps

        spectrogram = self._calculate_spectrogram(self.samples[sample_start:sample_end:step])
        if transpose:
            spectrogram = np.flipud(spectrogram.T)
        return self.create_image(spectrogram, colormaps.chosen_colormap_numpy_bgra,
                                 self.data_min, self.data_max)

    def create_image_segments(self):
        n_segments = max(1, self.time_bins // self.MAX_LINES_PER_VIEW)
        step = self.time_bins / n_segments
        step = max(1, int((step / self.hop_size) * self.hop_size ** 2))
        for i in range(0, len(self.samples), step):
            yield self.create_spectrogram_image(sample_start=i, sample_end=i + step)

    @staticmethod
    def apply_bgra_lookup(data: np.ndarray, colormap, data_min=None, data_max=None,
                          normalize=True) -> np.ndarray:
        if normalize and (data_min is None or data_max is None):
            raise ValueError("can't normalize without data min and data max")
        if normalize:
            normalized = (len(colormap) - 1) * ((data.T - data_min) / (data_max - data_min))
        else:
            normalized = data.T
        # -inf dB (silent bins) -> lowest color
        normalized = np.nan_to_num(normalized, nan=0.0, posinf=len(colormap) - 1, neginf=0.0)
        return np.take(colormap, normalized.astype(int), axis=0, mode="clip")

    @staticmethod
    def create_image(data: np.ndarray, colormap, data_min=None, data_max=None,
                     normalize=True) -> np.ndarray:
        """BGRA image array (H, W, 4) uint8 (no GUI toolkit dependency)."""
        image_data = Spectrogram.apply_bgra_lookup(data, colormap, data_min, data_max, normalize)
        return np.ascontiguousarray(image_data)
