"""Filter and spectrogram tests (mirror tests/test_filter.py and
tests/test_spectrogram.py in the reference)."""

import numpy as np
import pytest

import urh_tpu as ut
from urh_tpu.dsp.filters import Filter, FilterType, fir_filter, iir_filter
from urh_tpu.dsp.spectrogram import Spectrogram

from tests.golden import get_path_for_data_file


def naive_fir(x, h):
    n, m = len(x), len(h)
    out = np.zeros(n + m - 1, dtype=np.complex64)
    for i in range(n):
        for j in range(m):
            out[i + j] += x[i] * h[j]
    return out[:n]


def test_fir_filter_matches_naive():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=200) + 1j * rng.normal(size=200)).astype(np.complex64)
    h = (rng.normal(size=9) + 1j * rng.normal(size=9)).astype(np.complex64)
    np.testing.assert_allclose(fir_filter(x, h), naive_fir(x, h), atol=1e-3)


def test_fir_filter_overlap_save_long():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=50_000) + 1j * rng.normal(size=50_000)).astype(np.complex64)
    h = (rng.normal(size=31)).astype(np.complex64)
    got = fir_filter(x, h)
    exp = np.convolve(x, h)[: len(x)]
    np.testing.assert_allclose(got, exp, atol=1e-2)


def test_moving_average():
    f = Filter([0.1] * 10, FilterType.moving_average)
    x = np.ones(100, dtype=np.complex64)
    y = f.work(x)
    assert len(y) == 100
    np.testing.assert_allclose(y[20:], 1.0, atol=1e-4)


def test_dc_correction():
    f = Filter([], FilterType.dc_correction)
    x = np.ones((50, 2), dtype=np.float32) * 3.0
    y = f.work(x)
    np.testing.assert_allclose(y, 0.0, atol=1e-6)


def test_bandpass_design():
    h = Filter.design_windowed_sinc_bandpass(0.1, 0.4, 0.01)
    assert len(h) == 401
    # frequency response: passband vs stopband
    H = np.abs(np.fft.fft(h, 4096))
    freqs = np.fft.fftfreq(4096)
    passband = H[(freqs > 0.15) & (freqs < 0.35)]
    stopband = H[(freqs < -0.1)]
    assert passband.min() > 0.9
    assert stopband.max() < 0.01


def test_fft_convolve_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=1000).astype(np.float32)
    h = rng.normal(size=51).astype(np.float32)
    got = Filter.fft_convolve_1d(x, h)
    exp = np.convolve(x, h, mode="same")
    assert len(got) == len(exp)
    np.testing.assert_allclose(got, exp, atol=1e-3)


def test_iir_filter():
    a = np.array([1.0, 2.0])
    b = np.array([0.5])
    x = np.ones(20, dtype=np.complex64)
    got = iir_filter(a, b, x)
    exp = np.zeros(20, dtype=np.complex64)
    for n in range(max(len(a), len(b) + 1), 20):
        for j in range(len(a)):
            exp[n] += a[j] * x[n - j]
        for k in range(len(b)):
            exp[n] += b[k] * exp[n - 1 - k]
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_spectrogram_shapes():
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    spec = Spectrogram(sig.iq_array)
    assert spec.freq_bins == 1024
    assert spec.hop_size == 512
    stft = spec.stft(spec.samples)
    assert stft.shape[1] == 1024
    assert stft.shape[0] == spec.time_bins - 1 or stft.shape[0] >= 1


def test_spectrogram_peak_frequency():
    # pure tone at 0.1 fs must peak at the right bin
    n = 1 << 14
    t = np.arange(n)
    tone = np.exp(2j * np.pi * 0.1 * t).astype(np.complex64)
    spec = Spectrogram(tone)
    stft = spec.stft(tone)
    peak_bin = np.argmax(np.abs(stft[0]))
    assert abs(peak_bin - int(0.1 * 1024)) <= 1


def test_spectrogram_image():
    n = 1 << 12
    tone = np.exp(2j * np.pi * 0.25 * np.arange(n)).astype(np.complex64)
    spec = Spectrogram(tone)
    img = spec.create_spectrogram_image()
    assert img.ndim == 3 and img.shape[2] == 4
    assert img.dtype == np.uint8


def test_colormap_catalog_matches_reference():
    """All four reference maps (urh/colormaps.py:1043) plus grayscale,
    256 entries each, with the reference's plasma default."""
    from urh_tpu.util import colormaps

    for name in ("magma", "inferno", "plasma", "viridis"):
        assert name in colormaps.available_colormaps
        table = colormaps.maps[name]
        assert table.shape == (256, 3)
        assert table.min() >= 0.0 and table.max() <= 1.0
        # perceptually increasing luminance (dark -> bright endpoints)
        lum = table @ np.array([0.299, 0.587, 0.114])
        assert lum[0] < 0.35 < lum[-1]
    assert colormaps.default_colormap == "plasma"


def test_colormap_settings_roundtrip():
    from urh_tpu.util import colormaps

    colormaps.write_selected_colormap_to_settings("viridis")
    assert colormaps.read_selected_colormap_name_from_settings() == "viridis"
    colormaps.write_selected_colormap_to_settings("not-a-map")
    assert (colormaps.read_selected_colormap_name_from_settings()
            == colormaps.default_colormap)


@pytest.mark.parametrize("name", ["magma", "inferno", "plasma", "viridis",
                                  "grayscale"])
def test_spectrogram_image_golden_per_map(name):
    """Every rendered pixel must be a row of the selected map's BGRA
    table, and distinct maps must color the same spectrogram
    differently."""
    from urh_tpu.util import colormaps

    t = np.arange(4096)
    tone = np.exp(2j * np.pi * 0.1 * t).astype(np.complex64)
    spec = Spectrogram(tone, window_size=256)

    colormaps.choose_colormap(name)
    try:
        img = spec.create_spectrogram_image()
        table = {tuple(row) for row in colormaps.chosen_colormap_numpy_bgra}
        pixels = img.reshape(-1, img.shape[-1])
        sample = pixels[:: max(1, len(pixels) // 500)]
        assert all(tuple(px) in table for px in sample)
        # the tone vs noise-floor contrast must span many distinct colors
        assert len({tuple(px) for px in pixels}) > 16
    finally:
        colormaps.choose_colormap(colormaps.default_colormap)


def test_stft_host_twin_matches_device():
    """The placement host twin of the fused STFT-dB program must match
    the device output within float32 FFT tolerance."""
    import numpy as np

    from urh_tpu.dsp.spectrogram import Spectrogram

    rng = np.random.default_rng(5)
    tone = (np.exp(2j * np.pi * 0.05 * np.arange(40000))
            + 0.01 * (rng.normal(size=40000) + 1j * rng.normal(size=40000))
            ).astype(np.complex64)
    spec = Spectrogram(tone, window_size=512)
    samples, hop, frames, wf = spec._frame_params(spec.samples)

    host = np.fliplr(Spectrogram._stft_db_np(
        np.asarray(samples, np.complex64), 512, hop, frames, wf))

    import jax.numpy as jnp

    from urh_tpu.dsp.spectrogram import _stft_db_device
    samples = np.asarray(samples, np.complex64)
    device = np.fliplr(np.asarray(_stft_db_device(
        jnp.asarray(samples.real), jnp.asarray(samples.imag), 512, hop,
        frames, wf)))

    assert host.shape == device.shape
    finite = np.isfinite(host) & np.isfinite(device)
    np.testing.assert_allclose(host[finite], device[finite], atol=0.05)
    np.testing.assert_array_equal(np.isfinite(host), np.isfinite(device))
