"""Real-chip test lane (VERDICT r3 #6).

Run with:  URH_TPU_BACKEND=1 python -m pytest tests -m tpu -q

These tests exercise the golden demod path, the streaming core and the
Pallas kernels on the actual TPU backend.  Decisions (bits, states,
message counts) must be EXACT — they are what the framework guarantees;
real-valued intermediates (qad) get backend-appropriate tolerances
because TPU fusions order float math differently than XLA:CPU.

Only one process may use the TPU at a time: never run this lane
concurrently with bench.py or another TPU session.
"""

import numpy as np
import pytest

import urh_tpu as ut
from tests.golden import get_path_for_data_file

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"TPU backend not active ({jax.default_backend()!r})")


def _demod(sig):
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    return pa


def test_tpu_golden_fsk_bits_exact():
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0
    pa = _demod(sig)
    assert pa.plain_bits_str[0] == (
        "1010101010101010101010101010101011000110001001101100011000100110"
        "1111010011011100000111011001100011101110111101111010010000100111"
        "1001100110011100110100100011100111010011111100011"
    )


def test_tpu_golden_ask_bits_exact():
    sig = ut.Signal.from_file(get_path_for_data_file("ask.complex"))
    sig.modulation_type = "ASK"
    sig.samples_per_symbol = 295
    sig.center = 0.0219
    pa = _demod(sig)
    assert pa.plain_bits_str[0].startswith(
        "1011001001011011011011011011011011001000000")


def test_tpu_demod_kernel_matches_host():
    """Device afp_demod vs NumPy oracle: gate decisions exact, qad within
    TPU tolerance (atan2 implementation differs from libm)."""
    from urh_tpu.dsp.demod import afp_demod

    import jax.numpy as jnp

    raw = np.fromfile(get_path_for_data_file("fsk.complex"),
                      np.float32).reshape(-1, 2)
    noise = 0.0009
    # pass a device-resident array: adaptive placement would route this
    # capture to the native host twin on a bandwidth-limited link, but
    # this test exists to check the CHIP's numerics
    qad = np.asarray(afp_demod(jnp.asarray(raw), noise, "FSK", 2,
                               dtype=np.float32))

    re, im = raw[:, 0].astype(np.float64), raw[:, 1].astype(np.float64)
    mag2 = re * re + im * im
    pr = np.concatenate([re[:1], re[:-1]])
    pi = np.concatenate([im[:1], im[:-1]])
    val = np.arctan2(pr * im - pi * re, pr * re + pi * im)
    ref = np.where(mag2 <= noise * noise, -4.0, val)
    ref[0] = -4.0

    np.testing.assert_array_equal(qad == -4.0, ref == -4.0)
    mask = qad != -4.0
    np.testing.assert_allclose(qad[mask], ref[mask], atol=5e-3)
    # the decisions the bit pipeline actually uses must be exact
    np.testing.assert_array_equal(qad[mask] > 0, ref[mask] > 0)


def test_tpu_stream_demodulator_chunked():
    """StreamDemodulator over the golden capture in chunks must yield the
    same segments as the one-shot path."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.protocol.stream import StreamDemodulator

    raw = np.fromfile(get_path_for_data_file("fsk.complex"),
                      np.float32).reshape(-1, 2)
    params = DemodParams(modulation="FSK", samples_per_symbol=100,
                         center=0.0, noise_threshold=0.0009, tolerance=5)

    sd = StreamDemodulator(params)
    segments = []
    chunk = 8192
    for i in range(0, len(raw), chunk):
        segments.extend(sd.feed(raw[i:i + chunk]))
    segments.extend(sd.flush())
    assert len(segments) >= 1

    sd2 = StreamDemodulator(params)
    one_shot = list(sd2.feed(raw)) + list(sd2.flush())
    assert len(segments) == len(one_shot)
    for a, b in zip(segments, one_shot):
        assert a.start_sample == b.start_sample
        assert np.array_equal(np.asarray(a.ppseq), np.asarray(b.ppseq))


def test_tpu_pallas_fused_demod():
    """Pallas fused FSK demod+symbolize on-chip vs the NumPy oracle:
    states exact away from the gate boundary."""
    import jax.numpy as jnp

    from urh_tpu.dsp.pallas_kernels import (fused_fsk_demod_symbolize,
                                            pad_for_pallas)

    rng = np.random.default_rng(5)
    x = rng.normal(0, 0.5, (1 << 15, 2)).astype(np.float32)
    noise_sqrd = np.float32(1e-4)
    re_p, im_p, n = pad_for_pallas(x)

    qad, states = fused_fsk_demod_symbolize(
        jnp.asarray(re_p), jnp.asarray(im_p), jnp.float32(noise_sqrd),
        jnp.float32(0.0))
    qad = np.asarray(qad).reshape(-1)[:len(x)]
    states = np.asarray(states).reshape(-1)[:len(x)]

    re, im = x[:, 0], x[:, 1]
    mag2 = re * re + im * im
    pr = np.concatenate([re[:1], re[:-1]])
    pi = np.concatenate([im[:1], im[:-1]])
    t_im = pr * im - pi * re
    t_re = pr * re + pi * im
    ref_states = np.where(mag2 <= noise_sqrd, -1,
                          (np.arctan2(t_im, t_re) > 0).astype(np.int32))

    # ignore samples within float32 ulp of the noise gate
    solid = np.abs(mag2 - noise_sqrd) > 1e-6 * np.maximum(mag2, noise_sqrd)
    np.testing.assert_array_equal(states[solid & (ref_states >= 0)][1:],
                                  ref_states[solid & (ref_states >= 0)][1:])
    mask = (states >= 0) & solid
    np.testing.assert_allclose(qad[mask][1:],
                               np.arctan2(t_im, t_re)[mask][1:], atol=5e-3)


def test_tpu_modulate_roundtrip():
    """Modulate on device, demodulate on device, recover exact bits."""
    from urh_tpu.core.iq import IQData
    from urh_tpu.dsp.modulate import modulate

    bits_str = "10110010" * 8
    bits = np.array(list(map(int, bits_str)), dtype=np.uint8)
    iq = modulate(bits, 100, "FSK", np.float32([-10e3, 10e3]),
                  sample_rate=1e6, pause=1000)
    sig = ut.Signal.from_iq(IQData(iq, skip_conversion=True))
    sig.modulation_type = "FSK"
    sig.noise_threshold = 1e-3
    sig.center = 0
    sig.samples_per_symbol = 100
    pa = _demod(sig)
    assert pa.plain_bits_str[0] == bits_str


def test_tpu_psk_costas_golden():
    """Costas-loop carrier recovery on-chip over the golden noisy PSK
    capture (tests/test_demodulations.py:76-84 gate)."""
    sig = ut.Signal.from_file(get_path_for_data_file("psk_gen_noisy.complex"))
    sig.modulation_type = "PSK"
    sig.samples_per_symbol = 300
    sig.center = 0
    sig.noise_threshold = 0
    sig.tolerance = 10
    pa = _demod(sig)
    assert pa.plain_bits_str[0].startswith("1011"), pa.plain_bits_str[0]


def test_tpu_4fsk_roundtrip_exact():
    """4-ary FSK: modulate + demodulate on-chip, exact symbol recovery
    (tests/test_demodulations.py:118-135 gate)."""
    from urh_tpu.core.iq import IQData
    from urh_tpu.dsp.modulate import modulate

    bits = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 1], dtype=np.uint8)
    parameters = np.array([-20e3, -10e3, 10e3, 20e3], dtype=np.float32)
    result = modulate(bits, 100, "FSK", parameters, 2, 1, 40e3, 0, 1e6,
                      1000, 0)
    sig = ut.Signal.from_iq(IQData(result, skip_conversion=True))
    sig.noise_threshold = 0
    sig.bits_per_symbol = 2
    sig.center = 0
    sig.center_spacing = 0.1
    sig.modulation_type = "FSK"
    pa = _demod(sig)
    assert pa.plain_bits_str[0] == "1010110001"


def test_tpu_estimate_golden_fsk():
    """Full auto-interpretation estimate() with the chip active:
    modulation + bit length recovered from the golden capture."""
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    result = ut.estimate(sig.iq_array.data)
    assert result["modulation_type"] == "FSK"
    assert result["bit_length"] == 100


def test_tpu_cwt_haar_device_matches_host():
    """FFT-domain Haar CWT on-chip vs the NumPy twin."""
    import jax.numpy as jnp

    from urh_tpu.ai import device as ai_device

    from urh_tpu.core.xfer import to_device, to_host

    rng = np.random.default_rng(9)
    x = (rng.normal(0, 1, 4096) + 1j * rng.normal(0, 1, 4096)).astype(
        np.complex64)
    host = ai_device.cwt_haar_np(x, scale=10)
    dev = to_host(ai_device._cwt_haar_jax(to_device(x), 10))
    assert dev.shape[-1] == host.shape[-1]
    np.testing.assert_allclose(np.abs(dev), np.abs(host),
                               rtol=2e-2, atol=2e-2)


def test_tpu_classification_stats_device_path():
    """The fused on-chip classification statistics must agree with the
    host twin closely enough to make identical FSK/ASK decisions."""
    import jax.numpy as jnp

    from urh_tpu.ai import device as ai_device
    from urh_tpu.dsp.modulate import modulate

    rows = []
    for params, mod in (( [-20e3, 20e3], "fsk"), ([0.0, 1.0], "ask")):
        bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 32)
        iq = modulate(bits, 64, mod, params, sample_rate=1e6)
        c = iq[:, 0] + 1j * iq[:, 1]
        c += (0.01 * np.random.default_rng(3).normal(size=c.shape)
              ).astype(np.float32)
        rows.append(c[:2048])
    batch = np.vstack(rows).astype(np.complex64)
    norm_scale = np.abs(np.max(batch, axis=-1))

    dev = [np.asarray(r) for r in ai_device._classification_stats_jax(
        jnp.asarray(np.ascontiguousarray(batch.real)),
        jnp.asarray(np.ascontiguousarray(batch.imag)),
        jnp.asarray(norm_scale), 4, 11)]

    data = batch / norm_scale[:, None]
    unit = batch / np.abs(batch)
    fwd = np.fft.fft(data, axis=-1)
    mag = np.abs(ai_device.cwt_haar_np(data, 4, fwd=fwd))
    norm_mag = np.abs(ai_device.cwt_haar_np(unit, 4))
    host_var_mag = np.var(mag, axis=-1)
    host_var_norm = np.var(norm_mag, axis=-1)

    np.testing.assert_allclose(dev[0], host_var_mag, rtol=5e-2)
    np.testing.assert_allclose(dev[1], host_var_norm, rtol=5e-2)
    host_is_fsk = ai_device._fsk_test_np(
        np.abs(np.fft.fftshift(fwd, axes=-1)))
    np.testing.assert_array_equal(dev[4].astype(bool), host_is_fsk)


def test_tpu_awre_first_difference_matrix_exact():
    """awre pairwise first-difference matrix on-chip == host twin."""
    import jax.numpy as jnp

    from urh_tpu.awre import device as awre_device

    rng = np.random.default_rng(12)
    n, width = 48, 96
    data = rng.integers(0, 2, (n, width)).astype(np.uint8)
    lengths = rng.integers(width // 2, width + 1, n).astype(np.int64)

    host = awre_device._first_diff_block_np(data, lengths, data, lengths)
    dev = np.asarray(awre_device._first_diff_block_jax(
        jnp.asarray(data), jnp.asarray(lengths),
        jnp.asarray(data), jnp.asarray(lengths)))
    np.testing.assert_array_equal(dev, host)


def test_tpu_awre_batched_crc_exact():
    """Batched GF(2) CRC matmul on the MXU == bit-serial host CRC."""
    from urh_tpu.awre.device import batched_crc
    from urh_tpu.coding.crc import GenericCRC

    crc = GenericCRC(polynomial="16_standard", start_value=True)
    rng = np.random.default_rng(4)
    msgs = rng.integers(0, 2, (64, 128)).astype(np.uint8)

    from urh_tpu.awre import device as awre_device
    saved = awre_device.DEVICE_MIN_CELLS
    from urh_tpu.util import placement
    saved_verdicts = dict(placement._RACE_VERDICTS)
    try:
        awre_device.DEVICE_MIN_CELLS = 1  # force the device branch
        placement._RACE_VERDICTS["awre.batched_crc_matmul"] = "device"
        got = batched_crc(
            msgs, crc.polynomial, crc.start_value, crc.final_xor,
            crc.lsb_first, crc.reverse_polynomial, crc.reverse_all,
            crc.little_endian)
    finally:
        awre_device.DEVICE_MIN_CELLS = saved
        placement._RACE_VERDICTS.clear()
        placement._RACE_VERDICTS.update(saved_verdicts)
    import array as array_mod

    expected = np.array(
        [int("".join(map(str, np.asarray(
            crc.crc(array_mod.array("B", list(row)))).astype(int))), 2)
         for row in msgs], dtype=np.int64)
    np.testing.assert_array_equal(got, expected)


def test_tpu_awre_ngram_matrix_exact():
    """n-gram value matrix on-chip == host twin (integer exact)."""
    import jax.numpy as jnp

    from urh_tpu.awre import device as awre_device

    rng = np.random.default_rng(8)
    data = rng.integers(0, 2, (32, 80)).astype(np.uint8)
    lengths = rng.integers(40, 81, 32).astype(np.int64)
    for n in (4, 8):
        host_v, host_a = awre_device._ngram_matrix_np(data, lengths, n)
        dev_v, dev_a = awre_device._ngram_matrix_jax(
            jnp.asarray(data), jnp.asarray(lengths), n)
        np.testing.assert_array_equal(np.asarray(dev_v).astype(np.int64),
                                      host_v)
        np.testing.assert_array_equal(np.asarray(dev_a), host_a)


def test_tpu_spectrogram_stft_device():
    """Device STFT spectrogram over the golden capture vs the host
    float twin (dB within display tolerance)."""
    from urh_tpu.dsp.spectrogram import Spectrogram

    import jax.numpy as jnp

    from urh_tpu.dsp.spectrogram import Spectrogram, _stft_db_device

    raw = np.fromfile(get_path_for_data_file("fsk.complex"), np.complex64)
    spec = Spectrogram(raw)
    samples, hop, num_frames, wf = spec._frame_params(spec.samples)
    samples = np.asarray(samples, np.complex64)
    # the device program itself (placement would keep interactive
    # rendering on host over a slow relay; this test checks the CHIP)
    dev = np.asarray(_stft_db_device(
        jnp.asarray(np.ascontiguousarray(samples.real)),
        jnp.asarray(np.ascontiguousarray(samples.imag)),
        spec.window_size, hop, num_frames, wf))
    host = Spectrogram._stft_db_np(samples, spec.window_size, hop,
                                   num_frames, wf)
    assert dev.shape == host.shape
    finite = np.isfinite(host) & np.isfinite(dev) & (host > -130)
    assert finite.mean() > 0.9
    np.testing.assert_allclose(dev[finite], host[finite], atol=0.5)  # dB


def test_tpu_sharded_demod_single_chip_mesh():
    """The multichip demod path on a 1-chip mesh must equal the exact
    unsharded states over the golden capture."""
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.dsp.symbols import get_center_thresholds
    from urh_tpu.parallel.sharded import make_mesh, sharded_demodulate

    raw = np.fromfile(get_path_for_data_file("fsk.complex"),
                      np.float32).reshape(-1, 2)[:1 << 16]
    mesh = make_mesh(1)
    qad, states = sharded_demodulate(raw, 0.0009, "FSK", 0.0, 1.0, 1,
                                     mesh=mesh)
    ref_qad = np.asarray(afp_demod(raw, 0.0009, "FSK", 2,
                                   dtype=np.float32), np.float32)
    thresholds = get_center_thresholds(0.0, 1.0, 2)
    ref_states = np.where(
        ref_qad == np.float32(-4.0), -1,
        (ref_qad[:, None] > thresholds[None, :]).sum(axis=1))
    # away from the gate, decisions must match exactly
    np.testing.assert_array_equal(np.asarray(states)[1:],
                                  np.asarray(ref_states)[1:])


def test_tpu_sharded_fir_single_chip_mesh():
    """Overlap-save sharded FIR on a 1-chip mesh vs np.convolve."""
    from urh_tpu.parallel.sharded import make_mesh, sharded_fir_filter

    rng = np.random.default_rng(2)
    x = (rng.normal(0, 1, 1 << 14)
         + 1j * rng.normal(0, 1, 1 << 14)).astype(np.complex64)
    taps = np.hanning(31).astype(np.float32)
    taps /= taps.sum()
    out = sharded_fir_filter(x, taps, mesh=make_mesh(1))
    ref = np.convolve(x, taps)[:len(x)]
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_tpu_sharded_spectrogram_single_chip_mesh():
    """Sharded STFT on a 1-chip mesh vs the host Spectrogram.stft."""
    from urh_tpu.dsp.spectrogram import Spectrogram
    from urh_tpu.parallel.sharded import make_mesh, sharded_spectrogram

    raw = np.fromfile(get_path_for_data_file("fsk.complex"),
                      np.complex64)[:1 << 16]
    out = sharded_spectrogram(raw, mesh=make_mesh(1), window_size=1024)
    spec = Spectrogram(raw)
    ref = spec.stft(spec.samples)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.abs(out), np.abs(ref),
                               rtol=1e-2, atol=1e-2)


def test_tpu_sharded_pulse_lens_single_chip_mesh():
    """Sharded demod -> run-list path on a 1-chip mesh equals the exact
    grab_pulse_lens output."""
    from urh_tpu.dsp.symbols import grab_pulse_lens
    from urh_tpu.parallel.sharded import make_mesh, sharded_pulse_lens

    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0
    raw = sig.iq_array.data.astype(np.float32)
    out = sharded_pulse_lens(raw, sig.noise_threshold, "FSK", 0.0, 1.0, 1,
                             tolerance=5, samples_per_symbol=100,
                             mesh=make_mesh(1))
    ref = grab_pulse_lens(sig.qad, 0.0, 5, "FSK", 100, 1, 1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_tpu_stream_8ary_device_path():
    """bits_per_symbol=3 stream on the chip: the widened RLE state
    field must keep the device path exact (round-5 packing fix)."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.protocol.stream import StreamDemodulator

    rng = np.random.default_rng(11)
    symbols = rng.integers(0, 8, 32)
    bits = np.array([(s >> k) & 1 for s in symbols for k in (2, 1, 0)],
                    np.uint8)
    freqs = np.linspace(-35e3, 35e3, 8)
    iq = modulate(bits, 60, "fsk", list(freqs), sample_rate=1e6,
                  bits_per_symbol=3, pause=1500)
    params = DemodParams(modulation="FSK", samples_per_symbol=60,
                         bits_per_symbol=3, center=0.0,
                         center_spacing=2 * np.pi * 10e3 / 1e6,
                         noise_threshold=0.01, tolerance=5)

    def rows(backend):
        sd = StreamDemodulator(params, backend=backend)
        segs = list(sd.feed(iq)) + list(sd.flush())
        return np.concatenate([s.ppseq for s in segs])

    np.testing.assert_array_equal(rows("device"), rows("host"))


def test_tpu_enocean_wsp_golden():
    """EnOcean ASK + WSP decode on-chip: exact golden frames
    (tests/auto_interpretation/test_auto_interpretation_integration.py
    EnOcean gate)."""
    from urh_tpu.coding.encodings import DECODING_ENOCEAN, Encoding
    from urh_tpu.core.iq import IQData

    enocean = np.fromfile(get_path_for_data_file("enocean.complex"),
                          dtype=np.float32)
    result = ut.estimate(enocean)
    assert result["modulation_type"] == "ASK"
    assert result["bit_length"] == 40

    sig = ut.Signal.from_iq(IQData(enocean))
    sig.modulation_type = "ASK"
    sig.samples_per_symbol = 40
    sig.center = result["center"]
    sig.noise_threshold = result["noise"]
    sig.tolerance = result["tolerance"]
    sig.pause_threshold = 8
    pa = ut.ProtocolAnalyzer(sig)
    pa.get_protocol_from_signal()
    decoder = Encoding(["WSP", DECODING_ENOCEAN])
    for msg in pa.messages:
        msg.decoder = decoder
    frames = [msg.decoded_hex_str for msg in pa.messages]
    assert len(frames) == 3
    assert frames[0] == frames[2] == "aa9610002c1c024b"


def test_tpu_sharded_costas_exact_single_chip():
    """Block-chained Costas on a 1-chip mesh: bit-identical to the
    unsharded PSK demod."""
    from urh_tpu.dsp.demod import afp_demod
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.parallel.sharded import make_mesh, sharded_psk_demod_exact

    bits = np.resize([1, 0, 1, 1, 0, 0, 1, 0], 128)
    iq = modulate(np.asarray(bits, np.uint8), 100, "psk",
                  [0.0, np.pi], sample_rate=1e6, pause=0)
    out = sharded_psk_demod_exact(iq, 0.01, mod_order=2,
                                  mesh=make_mesh(1))
    ref = np.asarray(afp_demod(iq, 0.01, "PSK", 2, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    # decisions exact
    np.testing.assert_array_equal(np.asarray(out) > 0, ref > 0)


def test_tpu_gfsk_bursts_demodulate():
    """GFSK gaussian-FIR synthesis + demod on-chip (the reference
    test_modulator.py:68-86 gate)."""
    from urh_tpu.dsp.modulator import Modulator

    modulator = Modulator("gfsk")
    modulator.modulation_type = "GFSK"
    modulator.samples_per_symbol = 100
    modulator.sample_rate = 1e6
    modulator.parameters[1] = 20e3
    modulator.parameters[0] = -10e3
    data1 = modulator.modulate([True, False, False, True, False], 9437).data
    data2 = modulator.modulate([True, False, True], 9845).data
    data3 = modulator.modulate([True, False, True, False], 8458).data
    from urh_tpu.core.iq import IQData

    sig = ut.Signal.from_iq(IQData(
        np.concatenate((data1, data2, data3)), skip_conversion=True))
    sig.modulation_type = "FSK"
    pa = _demod(sig)
    # the three bursts must stay separate messages (the reference gate
    # is >= 1; asserting 3 also catches burst-merging regressions)
    assert len(pa.messages) == 3, pa.plain_bits_str
    assert pa.plain_bits_str[0].startswith("10"), pa.plain_bits_str


def test_tpu_4psk_roundtrip():
    """4-PSK modulate + Costas demod on-chip recovers the payload
    (tests/test_demodulations.py:87-104 gate)."""
    from urh_tpu.core.iq import IQData
    from urh_tpu.dsp.modulate import modulate

    bits = np.array([1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 0, 0, 0, 1, 0, 1],
                    dtype=np.uint8)
    angles_degree = [-135, -45, 45, 135]
    parameters = np.array([np.pi * a / 180 for a in angles_degree],
                          dtype=np.float32)
    result = modulate(bits, 100, "PSK", parameters, 2, 1, 40e3, 0, 1e6,
                      1000, 0)
    sig = ut.Signal.from_iq(IQData(result, skip_conversion=True))
    sig.noise_threshold = 0
    sig.bits_per_symbol = 2
    sig.center = 0
    sig.center_spacing = 1
    sig.modulation_type = "PSK"
    pa = _demod(sig)
    demod_bits = pa.plain_bits_str[0]
    assert len(demod_bits) == len(bits)
    assert demod_bits.startswith("10101010")
