"""Host/device twin consistency.

Several hot paths pick between a jitted kernel and a float32 NumPy twin
by workload size (urh_tpu.dsp.modulate.DEVICE_MIN_BODY_SAMPLES,
urh_tpu.ai.device.use_device).  These tests pin the twins to each other
so the adaptive threshold can never change results, and pin the fully
on-device median/variance reduction to the NumPy reference
implementation.
"""

import numpy as np
import pytest

from urh_tpu.ai import device as ai_device
from urh_tpu.dsp import modulate as m


def _twin_atol() -> float:
    """Measured twin divergence is dominated by libm-vs-XLA cos/sin ULP on
    float32 args of magnitude up to ~8e2 rad: ~6e-5 on XLA:CPU (measured),
    slightly larger on TPU.  Bound per backend, with headroom."""
    import jax

    return 2.0e-4 if jax.default_backend() != "cpu" else 1.0e-4


def test_synthesize_twins_match():
    rng = np.random.default_rng(0)
    n_sym = 257
    a = rng.uniform(0.5, 1.0, n_sym).astype(np.float32)
    f = rng.uniform(10e3, 50e3, n_sym).astype(np.float32)
    phi = rng.uniform(-np.pi, np.pi, n_sym).astype(np.float32)

    import jax.numpy as jnp

    dev = np.asarray(m._synthesize(jnp.asarray(a), jnp.asarray(f),
                                   jnp.asarray(phi), jnp.float32(3),
                                   jnp.float32(1e6), 10))
    host = m._synthesize_np(a, f, phi, 3, 1e6, 10)
    assert host.shape == dev.shape == (n_sym * 10, 2)
    np.testing.assert_allclose(host, dev, atol=_twin_atol())


def test_synthesize_per_sample_twins_match():
    rng = np.random.default_rng(1)
    n = 4097
    a = rng.uniform(0.5, 1.0, n).astype(np.float32)
    f = rng.uniform(10e3, 50e3, n).astype(np.float32)
    phi = rng.uniform(-np.pi, np.pi, n).astype(np.float32)

    import jax.numpy as jnp

    dev = np.asarray(m._synthesize_per_sample(
        jnp.asarray(a), jnp.asarray(f), jnp.asarray(phi),
        jnp.float32(0), jnp.float32(2e6)))
    host = m._synthesize_per_sample_np(a, f, phi, 0, 2e6)
    np.testing.assert_allclose(host, dev, atol=_twin_atol())


def test_modulate_same_bits_across_threshold(monkeypatch):
    """Demodulating host-path output must give the same bits as the
    device path: force each route via the threshold and round-trip."""
    from urh_tpu.core.signal import Signal
    from urh_tpu.protocol.analyzer import demodulate

    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1], np.uint8), 300)

    outputs = {}
    for name, threshold in (("host", 1 << 62), ("device", 0)):
        monkeypatch.setattr(m, "DEVICE_MIN_BODY_SAMPLES", threshold)
        # symmetric mark/space around 0 so the FSK discriminator's
        # center=0 threshold actually separates the two symbols
        outputs[name] = m.modulate(bits, 100, "fsk", [-20e3, 20e3],
                                   sample_rate=1e6, pause=1000)

    assert outputs["host"].shape == outputs["device"].shape
    for name, iq in outputs.items():
        sig = Signal.from_iq(iq)
        sig.modulation_type = "FSK"
        sig.samples_per_symbol = 100
        sig.center = 0
        sig.noise_threshold = 0.01
        msgs = demodulate(sig)
        assert len(msgs) == 1, name
        assert list(msgs[0].plain_bits) == list(bits), name


def test_classification_stats_device_vs_host_paths(monkeypatch):
    """The all-on-device variance reduction must agree with the NumPy
    fallback (same decisions on both sides of use_device)."""
    rng = np.random.default_rng(2)
    n = 4096
    t = np.arange(n)
    rows = []
    for f in (0.01, 0.03):
        rows.append((np.exp(2j * np.pi * f * t)
                     + 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
                     ).astype(np.complex64))
    batch = np.stack(rows)

    monkeypatch.setattr(ai_device, "DEVICE_MIN_CELLS", 1 << 62)
    host = ai_device.classification_stats(batch.copy())
    monkeypatch.setattr(ai_device, "DEVICE_MIN_CELLS", 0)
    dev = ai_device.classification_stats(batch.copy())

    np.testing.assert_array_equal(host["is_fsk"], dev["is_fsk"])
    for key in ("var_mag", "var_norm_mag", "var_filtered_mag",
                "var_filtered_norm_mag"):
        np.testing.assert_allclose(host[key], dev[key], rtol=2e-3,
                                   err_msg=key)


def test_median_filtered_jax_matches_reference_filter():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    rows = rng.normal(size=(3, 100)).astype(np.float32)
    k = 11
    dev = np.asarray(ai_device._median_filtered_jax(jnp.asarray(rows), k))
    host = ai_device.median_filter_rows(rows, k)
    np.testing.assert_allclose(dev, host, rtol=1e-6)


def test_histogram_threshold_routes_to_host():
    values = np.random.default_rng(4).normal(size=10_000)
    edges = np.linspace(-4, 4, 65)
    counts = ai_device.histogram(values, edges)
    expected, _ = np.histogram(values, bins=edges)
    np.testing.assert_array_equal(counts, expected)


def test_histogram_device_path_matches_numpy(monkeypatch):
    monkeypatch.setattr(ai_device, "HISTOGRAM_MIN_VALUES", 0)
    values = np.random.default_rng(5).normal(size=20_000)
    edges = np.linspace(-4, 4, 33)
    counts = ai_device.histogram(values, edges)
    expected, _ = np.histogram(values, bins=edges)
    # device variant clips edge values into the outer bins, numpy drops
    # values outside [lo, hi]; inside bins must agree exactly
    np.testing.assert_array_equal(counts[1:-1], expected[1:-1])


def test_classification_stats_staged_matches_upload_path():
    """Slicing segments out of a staged device capture must give the same
    stats as uploading the segment batch directly."""
    import jax.numpy as jnp

    from urh_tpu.ai import device as ai_device

    rng = np.random.default_rng(5)
    n, width = 4096, 512
    planes = rng.normal(0, 0.5, (n, 2)).astype(np.float32)
    starts = [0, 700, 1500, 3000]

    staged = ai_device.classification_stats_staged(
        jnp.asarray(planes), starts, width)

    batch = np.stack([
        (planes[s:s + width, 0] + 1j * planes[s:s + width, 1]).astype(
            np.complex64) for s in starts])
    uploaded = ai_device.classification_stats(batch)

    for key in ("var_mag", "var_norm_mag", "var_filtered_mag",
                "var_filtered_norm_mag"):
        np.testing.assert_allclose(np.asarray(staged[key]),
                                   np.asarray(uploaded[key]),
                                   rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(staged["is_fsk"]),
                                  np.asarray(uploaded["is_fsk"]))


def test_estimate_staged_path_used_and_correct(monkeypatch):
    """estimate() on a large capture stages the planes once; results match
    the unstaged route."""
    from urh_tpu.ai import device as ai_device
    from urh_tpu.ai.estimate import estimate
    from urh_tpu.dsp.modulate import modulate

    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 200)
    msgs = [modulate(bits, 100, "fsk", [-20e3, 20e3], carrier_frequency=0.0,
                     sample_rate=1e6, pause=30_000) for _ in range(4)]
    rng = np.random.default_rng(2)
    capture = np.concatenate(msgs)
    capture += rng.normal(0, 0.01, capture.shape).astype(np.float32)

    with_staging = estimate(capture)

    monkeypatch.setattr(ai_device, "DEVICE_MIN_CELLS", 1 << 62)
    without = estimate(capture)
    assert with_staging["modulation_type"] == without["modulation_type"] == "FSK"
    assert with_staging["bit_length"] == without["bit_length"]
    assert abs(with_staging["center"] - without["center"]) < 1e-4
