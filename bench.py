"""Headline benchmark: complex Msamples/s through the demod pipeline.

Prints ONE JSON line.  The HEADLINE metric is the production-shaped
streaming pipeline: chunked IQ through StreamDemodulator (fused
demod + symbolize + run extraction, adaptive host/device placement) to
message segments — a number a real capture path hits.  The raw
demod-chain kernel rooflines (VMEM-resident dependent chains) are kept
as a labeled entry under "extra" with every path reported individually,
so a silently-degraded fast path stays visible.  If the production
states-only fast path validates but cannot be timed, the bench FAILS
LOUDLY (non-zero exit) instead of falling back quietly.

Sub-benchmarks under "extra":
  - filter_demod_chain: FIR band filter + FSK demod + symbol decision
    (the BASELINE.md target chain) vs the same chain in NumPy.
  - fsk_modulation: bits -> IQ synthesis throughput, shaped after the
    reference's tests/performance/modulator_performance.py:6-52
    (~1.5k bits @ sps=100 + a 1M-sample pause) vs NumPy synthesis.
  - awre_format_finding: FormatFinder.run() on a generated 1k-message
    protocol (device-batched awre kernels), messages/s.
  - auto_interpretation_estimate: full estimate() on a synthetic FSK
    capture, Msamples/s.

Timing is honest against async dispatch and RPC-tunneled devices: the
kernel is applied k times as a dependent chain inside a single jit
dispatch, a scalar reduction is read back to force execution, and the
marginal per-iteration slope between two long chains is used so fixed
dispatch overhead cancels.
"""

import json
import os
import sys
import time

import numpy as np

# overridable for quick local smoke runs (the driver uses the defaults)
N = int(os.environ.get("URH_BENCH_N", 1 << 22))  # complex samples per kernel
K = int(os.environ.get("URH_BENCH_K", 256))
# K: chained applications per timed dispatch; the chain must dominate the
# ~10ms RPC-tunnel RTT jitter, otherwise (t_{K+1} - t_1)/K measures noise


def numpy_baseline(x, noise_sqrd, thresholds, with_pulses=False):
    """Reference-chain equivalent in NumPy (CPU).

    ``with_pulses`` additionally run-length encodes the states — the part
    of the reference per-chunk sniffer chain (grab_pulse_lens,
    ProtocolSniffer.py:251-266) that follows demodulation."""
    re, im = x[:, 0], x[:, 1]
    mag2 = re * re + im * im
    prev_re = np.concatenate([re[:1], re[:-1]])
    prev_im = np.concatenate([im[:1], im[:-1]])
    t_re = prev_re * re + prev_im * im
    t_im = prev_re * im - prev_im * re
    val = np.arctan2(t_im, t_re)
    qad = np.where(mag2 <= noise_sqrd, np.float32(-4.0), val)
    states = (qad[:, None] > thresholds[None, :]).sum(axis=1).astype(np.int32)
    states = np.where(qad == np.float32(-4.0), -1, states)
    if not with_pulses:
        return qad, states
    edges = np.flatnonzero(np.diff(states)) + 1
    starts = np.concatenate(([0], edges))
    ends = np.concatenate((edges, [len(states)]))
    return qad, states, np.column_stack((states[starts], ends - starts))


def attach_reference(result: dict) -> dict:
    """Add vs_reference from REF_BASELINE.json (the reference's own
    Python pipelines over native builds of its Cython kernels, measured
    on this box by tools/ref_baseline/measure.py)."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "REF_BASELINE.json")) as f:
            ref = json.load(f)["results"].get(result["metric"], {})
        if "value" in ref:
            result["reference_value"] = ref["value"]
            result["vs_reference"] = round(result["value"] / ref["value"], 2)
    except (OSError, KeyError, ValueError, ZeroDivisionError):
        pass
    return result


def median_time(fn, trials=7):
    fn()  # warm (compile)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def best_time(fn, trials=9):
    """Best-of: for CPU-vs-CPU comparisons on a shared box, the minimum
    is the least load-contaminated estimate for both sides."""
    fn()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def chain_slope(run_k, trials=7):
    """Marginal per-iteration time of a dependent chain: the median-time
    difference between a 5K+1 and a K+1 chain, divided by 4K.  Two LONG
    chains so the ~10ms RPC-tunnel RTT and dispatch overhead cancel (a
    1-vs-K difference is dominated by that fixed overhead).  Returns
    None when jitter still swamps the delta (non-positive slope) so the
    caller can discard the measurement instead of reporting nonsense."""
    slope = (median_time(lambda: float(run_k(5 * K + 1)), trials)
             - median_time(lambda: float(run_k(K + 1)), trials)) / (4 * K)
    return slope if slope > 0 else None


def chain_slope_retry(run_k, attempts=3):
    """chain_slope with retries; None only if every attempt was jittered."""
    for _ in range(attempts):
        slope = chain_slope(run_k)
        if slope is not None:
            return slope
    return None


def bench_demod_paths(jax, jnp, partial, x_host, noise_sqrd, thresholds):
    """Time every demodulation path; returns ({path: Msps|None}, errors)."""
    paths = {}
    errors = {}

    def kernel(x):
        re, im = x[:, 0], x[:, 1]
        mag2 = re * re + im * im
        prev_re = jnp.concatenate([re[:1], re[:-1]])
        prev_im = jnp.concatenate([im[:1], im[:-1]])
        val = jnp.arctan2(prev_re * im - prev_im * re, prev_re * re + prev_im * im)
        qad = jnp.where(mag2 <= noise_sqrd, jnp.float32(-4.0), val)
        states = jnp.where(qad == -4.0, -1, (qad > thresholds[0]).astype(jnp.int32))
        # feed qad back as next input so iterations stay dependent
        return jnp.stack([qad, x[:, 1]], axis=-1), states

    @partial(jax.jit, static_argnames="k")
    def step_k(x, k):
        def body(i, carry):
            x, _ = carry
            nxt, states = kernel(x)
            # fold states into the carried samples: both outputs stay live
            nxt = nxt.at[:, 0].add(jnp.float32(1e-12) * states.astype(jnp.float32))
            return nxt, states
        out, states = jax.lax.fori_loop(0, k, body, (x, jnp.zeros(x.shape[0], jnp.int32)))
        # scalar summary forces full execution with a tiny readback
        return out[:, 0].sum() + states.sum()

    x = jax.device_put(x_host)
    t = chain_slope_retry(lambda k: step_k(x, k))
    paths["f32_chain"] = round(N / t / 1e6, 1) if t else None
    if t is None:
        errors["f32_chain"] = "slope not measurable (jitter)"

    # --- comparison-only states path (production fast path) ---------------
    # For binary FSK the symbol decision needs no atan2: sign(t_im) decides
    # the state (threshold 0), noise gating stays on |x|^2.  This is the
    # fast path Signal/ProtocolAnalyzer use for states-only demodulation;
    # it produces IDENTICAL states to the atan2 chain, which we verify
    # below before trusting its timing.
    re_h = np.ascontiguousarray(x_host[:, 0])
    im_h = np.ascontiguousarray(x_host[:, 1])

    @partial(jax.jit, static_argnames="k")
    def states_only_k(re, im, k):
        # ARRAY feedback in the scan carry: each iteration's states are
        # folded into the carried samples, so no iteration can be hoisted,
        # CSE'd, or algebraically collapsed (scalar-only dependence chains
        # were silently optimized away by the compiler).
        def body(carry, _):
            r, i = carry
            pr = jnp.concatenate([r[:1], r[:-1]])
            pi = jnp.concatenate([i[:1], i[:-1]])
            t_im = pr * i - pi * r
            mag2 = r * r + i * i
            states = jnp.where(mag2 <= noise_sqrd, jnp.int32(-1),
                               (t_im > 0).astype(jnp.int32)).astype(jnp.int8)
            # value-identical feedback (0.5 + 1e-30 == 0.5 in f32) that the
            # compiler cannot prove to be a no-op
            r_next = r + jnp.float32(1e-30) * states.astype(jnp.float32)
            return (r_next, i), states.astype(jnp.int32).sum()
        (r, _), ssums = jax.lax.scan(body, (re, im), None, length=k)
        return r.sum() + ssums.sum().astype(jnp.float32)

    # correctness gate: states must match the reference-algorithm chain
    _, ref_states = numpy_baseline(x_host, noise_sqrd, thresholds)
    prev_re = np.concatenate([re_h[:1], re_h[:-1]])
    prev_im = np.concatenate([im_h[:1], im_h[:-1]])
    t_im_h = prev_re * im_h - prev_im * re_h
    fast_states = np.where(re_h * re_h + im_h * im_h <= noise_sqrd, -1,
                           (t_im_h > 0).astype(np.int32))
    if not np.array_equal(ref_states, fast_states):
        errors["states_fast"] = "validation FAILED: states differ from atan2 chain"
        paths["states_fast"] = None
    else:
        re_d, im_d = jax.device_put(re_h), jax.device_put(im_h)
        t = chain_slope_retry(lambda k: states_only_k(re_d, im_d, k))
        paths["states_fast"] = round(N / t / 1e6, 1) if t else None
        if t is None:
            errors["states_fast"] = "validated but NOT timeable after 3 attempts"

    # --- hand-fused Pallas paths (TPU only) -------------------------------
    if jax.default_backend() == "tpu":
        try:
            from urh_tpu.dsp.pallas_kernels import (
                fused_fsk_demod_symbolize, fused_fsk_symbolize_i8, pad_for_pallas)

            re_p, im_p, _ = pad_for_pallas(x_host)
            re_pd, im_pd = jax.device_put(re_p), jax.device_put(im_p)
            ns_d, thr_d = jnp.float32(noise_sqrd), jnp.float32(0.0)

            @partial(jax.jit, static_argnames="k")
            def pallas_k(re, im, k):
                def body(acc, _):
                    qad, states = fused_fsk_demod_symbolize(acc, im, ns_d, thr_d)
                    # fold BOTH outputs into the carried value so neither
                    # stream can be dead-code-eliminated or deferred past
                    # the timed chain
                    nxt = qad + jnp.float32(1e-12) * states.astype(jnp.float32)
                    return nxt, states.astype(jnp.int32).sum()
                out, ssums = jax.lax.scan(body, re, None, length=k)
                return out.sum() + ssums.sum().astype(jnp.float32)

            t = chain_slope_retry(lambda k: pallas_k(re_pd, im_pd, k))
            paths["pallas_fused"] = round(re_p.size / t / 1e6, 1) if t else None
            if t is None:
                errors["pallas_fused"] = "slope not measurable (jitter)"
        except Exception as e:  # pragma: no cover - report, don't hide
            paths["pallas_fused"] = None
            errors["pallas_fused"] = f"{type(e).__name__}: {e}"

        try:
            from urh_tpu.dsp.pallas_kernels import fused_fsk_symbolize_i8, LANES

            rng = np.random.default_rng(1)
            i8 = rng.integers(-127, 128, (N, 2), dtype=np.int8)
            re8 = jnp.asarray(np.ascontiguousarray(i8[:, 0]).reshape(-1, LANES))
            im8 = jnp.asarray(np.ascontiguousarray(i8[:, 1]).reshape(-1, LANES))
            ns8 = jnp.float32(4.0)

            @partial(jax.jit, static_argnames="k")
            def i8_k(re, im, k):
                def body(carry, _):
                    states = fused_fsk_symbolize_i8(re, im, ns8 + carry,
                                                    jnp.float32(0.0))
                    # carry depends on the states so iterations chain
                    return jnp.float32(1e-30) * states.astype(jnp.float32).sum(), \
                        states.astype(jnp.int32).sum()
                _, ssums = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
                return ssums.sum().astype(jnp.float32)

            t = chain_slope_retry(lambda k: i8_k(re8, im8, k))
            paths["pallas_i8_ingest"] = round(N / t / 1e6, 1) if t else None
            if t is None:
                errors["pallas_i8_ingest"] = "slope not measurable (jitter)"
        except Exception as e:  # pragma: no cover
            paths["pallas_i8_ingest"] = None
            errors["pallas_i8_ingest"] = f"{type(e).__name__}: {e}"

    return paths, errors


def bench_filter_demod_chain(jax, jnp, partial, x_host, noise_sqrd):
    """BASELINE.md target chain: FIR band filter + FSK demod + decision."""
    taps_h = np.sinc(np.linspace(-4, 4, 127)).astype(np.float32)
    taps_h /= taps_h.sum()

    def chain_np(x):
        re = np.fft.irfft(np.fft.rfft(x[:, 0], 2 * N) * np.fft.rfft(taps_h, 2 * N))[:N]
        im = np.fft.irfft(np.fft.rfft(x[:, 1], 2 * N) * np.fft.rfft(taps_h, 2 * N))[:N]
        y = np.stack([re, im], axis=-1).astype(np.float32)
        return numpy_baseline(y, noise_sqrd, np.float32([0.0]))

    chain_np(x_host)  # warm caches
    base_t = median_time(lambda: chain_np(x_host), trials=3)
    base_msps = N / base_t / 1e6

    # the filter's frequency response is shipped as two FLOAT planes and
    # recombined on device: the axon TPU tunnel cannot transfer complex
    # dtypes host<->device at all (batched_device_put -> UNIMPLEMENTED).
    # NOTE: a batched overlap-save variant was benchmarked and lowered
    # catastrophically inside lax.scan on this backend (5 min compile,
    # 100x slower run, one observed TPU worker crash); the monolithic
    # rfft chain is the stable, faster-compiling form for this shape.
    # Also measured and rejected (r3): a 2-channel grouped
    # conv_general_dilated (VPU-shaped, ~100 Msps steady and
    # JaxRuntimeError inside scan) and a banded-matmul FIR
    # ((N/256, 382) @ (382, 256) MXU tiles, 122 Msps — frame-gather
    # bound).  FFT overlap wins on both this TPU and XLA:CPU.
    taps_f_h = np.fft.rfft(taps_h, 2 * N)
    tf_re_h = np.ascontiguousarray(taps_f_h.real).astype(np.float32)
    tf_im_h = np.ascontiguousarray(taps_f_h.imag).astype(np.float32)

    def chain_dev(x, taps_f):
        re = jnp.fft.irfft(jnp.fft.rfft(x[:, 0], 2 * N) * taps_f)[:N]
        im = jnp.fft.irfft(jnp.fft.rfft(x[:, 1], 2 * N) * taps_f)[:N]
        mag2 = re * re + im * im
        pr = jnp.concatenate([re[:1], re[:-1]])
        pi = jnp.concatenate([im[:1], im[:-1]])
        qad = jnp.arctan2(pr * im - pi * re, pr * re + pi * im)
        qad = jnp.where(mag2 <= noise_sqrd, jnp.float32(-4.0), qad)
        states = jnp.where(qad == -4.0, -1, (qad > 0).astype(jnp.int32))
        return qad, states

    @partial(jax.jit, static_argnames="k")
    def chain_k(x, tf_re, tf_im, k):
        taps_f = jax.lax.complex(tf_re, tf_im)
        def body(carry, _):
            qad, states = chain_dev(carry, taps_f)
            nxt = carry.at[:, 0].set(qad.astype(jnp.float32))
            return nxt, states.astype(jnp.int32).sum()
        out, ssums = jax.lax.scan(body, x, None, length=k)
        return out[:, 0].sum() + ssums.sum().astype(jnp.float32)

    x = jax.device_put(x_host)
    tf_re, tf_im = jax.device_put(tf_re_h), jax.device_put(tf_im_h)
    t = chain_slope_retry(lambda k: chain_k(x, tf_re, tf_im, k))
    if t is None:
        return {"metric": "filter_demod_chain_throughput", "value": 0.0,
                "unit": "Msamples/s", "error": "slope not measurable"}
    msps = N / t / 1e6
    return attach_reference(
        {"metric": "filter_demod_chain_throughput",
         "value": round(msps, 1), "unit": "Msamples/s",
         "vs_baseline": round(msps / base_msps, 2)})


def bench_modulation():
    """Shape of the reference's modulator_performance.py: FSK-modulate
    ~1.5k bits at sps=100 plus a 1M-sample pause, end-to-end into a host
    buffer (the adaptive small-body path).  A second number times the
    device synthesis kernel itself as a dependent chain (the path large
    TX batches take)."""
    from urh_tpu.dsp.modulator import Modulator

    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1], dtype=np.uint8), 1500)
    pause = 1_000_000
    sps, f0, f1, sr = 100, 20e3, 40e3, 1e6

    import array
    mod = Modulator("perf")
    mod.modulation_type = "FSK"
    mod.samples_per_symbol = sps
    mod.sample_rate = sr
    mod.parameters = array.array("f", [f0, f1])
    out = mod.modulate(bits, pause=pause)
    n_out = len(out.data)
    # separated best-of windows after a settle: the ~1.2 ms workload is
    # small enough that XLA worker threads still spinning down from the
    # previous sub-bench (or any scheduler burst on this 2-core box) can
    # shadow a single short trial window
    time.sleep(0.5)
    t_host = best_time(lambda: mod.modulate(bits, pause=pause), trials=15)
    for _ in range(4):
        time.sleep(0.3)
        t_host = min(t_host, best_time(
            lambda: mod.modulate(bits, pause=pause), trials=15))

    def np_synth():
        f = np.repeat(np.where(bits == 0, np.float32(f0), np.float32(f1)), sps)
        # cumulative phase keeps FSK continuous (reference semantics)
        dphi = 2 * np.pi * f / sr
        phase = np.cumsum(dphi) - dphi[0]
        re = np.cos(phase).astype(np.float32)
        im = np.sin(phase).astype(np.float32)
        buf = np.zeros((len(f) + pause, 2), np.float32)
        buf[:len(f), 0] = re
        buf[:len(f), 1] = im
        return buf

    np_synth()
    t_np = best_time(np_synth)
    result = {"metric": "fsk_modulation_throughput",
              "value": round(n_out / t_host / 1e6, 1), "unit": "Msamples/s",
              "vs_baseline": round(t_np / t_host, 2)}

    # device synthesis kernel: dependent chain, no host readback in the
    # timed region (production TX pipelines keep the samples on device)
    import jax
    import jax.numpy as jnp
    from functools import partial
    from urh_tpu.dsp.modulate import _synthesize_per_sample

    n_body = 1 << 23
    a = jnp.ones(n_body, jnp.float32)
    f = jnp.asarray(np.resize(np.float32([20e3, 40e3]), n_body))
    phi = jnp.zeros(n_body, jnp.float32)

    @partial(jax.jit, static_argnames="k")
    def synth_k(a0, k):
        def body(acc, _):
            iq = _synthesize_per_sample(acc, f, phi, jnp.float32(0), jnp.float32(1e6))
            return acc + jnp.float32(1e-30) * iq[:, 0], iq[:, 1].sum()
        acc, sums = jax.lax.scan(body, a0, None, length=k)
        return acc.sum() + sums.sum()

    t_dev = chain_slope_retry(lambda k: synth_k(a, k))
    if t_dev:
        result["device_synthesis_msps"] = round(n_body / t_dev / 1e6, 1)
    return attach_reference(result)


def bench_sniffer():
    """Live-sniffer streaming pipeline: chunked capture through
    StreamDemodulator (device demod+symbolize, run-carry on host) to
    messages.  Baseline: the same chunk loop with the NumPy
    demod+symbolize chain (what a CPU sniffer would do per chunk)."""
    from urh_tpu.dsp.demod import DemodParams
    from urh_tpu.dsp.modulate import modulate
    from urh_tpu.protocol.stream import StreamDemodulator

    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 256)
    one = modulate(bits, 100, "fsk", [-20e3, 20e3], sample_rate=1e6,
                   pause=2000)
    capture = np.tile(one, (64, 1)).astype(np.float32)
    n = len(capture)
    chunk = 1 << 17

    def make_params():
        return DemodParams(modulation="FSK", samples_per_symbol=100,
                           center=0.0, noise_threshold=1e-3, tolerance=5)

    backend = {"picked": None}

    def run():
        sd = StreamDemodulator(make_params())  # auto host/device routing
        count = 0
        for i in range(0, n, chunk):
            count += len(sd.feed(capture[i:i + chunk]))
        backend["picked"] = sd.backend
        return count + len(sd.flush())

    segments = run()  # warm compiles

    thresholds = np.float32([0.0])
    noise_sqrd = np.float32(1e-6)

    def host_run():
        # the reference sniffer chain per chunk: demod + symbolize +
        # pulse extraction (ProtocolSniffer.py:251-266)
        for i in range(0, n, chunk):
            numpy_baseline(capture[i:i + chunk], noise_sqrd, thresholds,
                           with_pulses=True)

    host_run()  # warm
    # interleaved best-of over a multi-second window: load bursts on
    # this box only add time, sequential per-leg windows turn slow
    # drift into a fake ratio, and a wide window gives both legs a
    # chance to sample a quiet period
    t = t_host = float("inf")
    for _ in range(16):
        t0 = time.perf_counter()
        run()
        t = min(t, time.perf_counter() - t0)
        t0 = time.perf_counter()
        host_run()
        t_host = min(t_host, time.perf_counter() - t0)
    msps = n / t / 1e6

    # forced-device reference point: int8 ingest (the SDR dtype, 2
    # bytes/sample up) -> on-device normalize + fused
    # demod+symbolize+RLE -> packed sub-byte/sample readback.  On a
    # relay-tunneled chip the upload still dominates and auto correctly
    # picks host; on a locally attached chip this path wins.
    capture_i8 = np.clip(np.round(capture * 127), -128, 127).astype(np.int8)

    def device_run():
        sd = StreamDemodulator(make_params(), backend="device")
        count = 0
        for i in range(0, n, chunk):
            count += len(sd.feed(capture_i8[i:i + chunk]))
        return count + len(sd.flush())

    try:
        device_run()
        # best-of-3: the relay link's latency is bursty and a wedged
        # transfer would otherwise report a 10x-low number
        t_device = best_time(device_run, trials=3)
        device_msps = round(n / t_device / 1e6, 1)
    except Exception:
        device_msps = None

    return attach_reference(
        {"metric": "sniffer_streaming_throughput",
         "value": round(msps, 1), "unit": "Msamples/s",
         "vs_baseline": round(t_host / t, 2),
         "backend": backend["picked"],
         "device_i8_ingest_msps": device_msps,
         "segments": segments, "samples": n})


def bench_simulator_tx_roundtrip():
    """TX round-trip over localhost TCP, the shape of the reference's
    simulator performance harness (tests/performance/
    simulator_perfomance.py:25-56): modulate a message, stream it
    through EndlessSender -> Network SDR -> TCP sink, report the
    wall-clock from push to complete reception."""
    import socket

    from urh_tpu.dev.backend_handler import BackendHandler
    from urh_tpu.dev.endless_sender import EndlessSender
    from urh_tpu.dev.network_sdr import NetworkSDRInterfacePlugin
    from urh_tpu.dsp.modulator import Modulator

    modulator = Modulator("perf")
    modulator.modulation_type = "FSK"
    modulator.samples_per_symbol = 100
    modulator.parameters[0] = 10e3
    modulator.parameters[1] = 20e3
    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 2000)
    iq = modulator.modulate(bits, pause=0)
    expected_bytes = len(iq.data.tobytes())

    sink = socket.socket()
    sink.bind(("127.0.0.1", 0))
    sink.listen(1)
    sender = EndlessSender(BackendHandler(),
                           NetworkSDRInterfacePlugin.NETWORK_SDR_NAME)
    sender.device.set_client_port(sink.getsockname()[1])
    sender.start()
    try:
        conn, _ = sink.accept()
        conn.settimeout(10.0)
        latencies = []
        for _ in range(5):
            got = 0
            t0 = time.perf_counter()
            sender.push_data(iq.data)
            while got < expected_bytes:
                data = conn.recv(1 << 16)
                if not data:
                    raise RuntimeError("TX socket closed mid-transfer")
                got += len(data)
            latencies.append(time.perf_counter() - t0)
        conn.close()
    finally:
        sender.stop()
        sink.close()

    best = min(latencies)
    n_samples = len(iq.data)
    return {"metric": "simulator_tx_roundtrip",
            "value": round(best * 1e3, 2), "unit": "ms",
            "samples": int(n_samples),
            "throughput_msps": round(n_samples / best / 1e6, 1)}


def bench_awre_format_finding():
    """FormatFinder.run() on a generated 1k-message protocol."""
    from urh_tpu.awre.format_finder import FormatFinder
    from urh_tpu.awre.message_type_builder import MessageTypeBuilder
    from urh_tpu.awre.protocol_generator import ProtocolGenerator
    from urh_tpu.protocol.labels import FieldType, MessageType, Participant

    n_msgs = 1000
    alice = Participant("Alice", address_hex="1337")
    bob = Participant("Bob", address_hex="4711")

    mb = MessageTypeBuilder("data")
    mb.add_label(FieldType.Function.PREAMBLE, 16)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 16)
    mb.add_label(FieldType.Function.DST_ADDRESS, 16)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 8)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: "0x9a7d"},
                           participants=[alice, bob])
    rng = np.random.default_rng(42)
    for i in range(n_msgs):
        data = "".join(rng.choice(["0", "1"], size=16 if i % 2 else 32))
        src, dst = (alice, bob) if i % 2 else (bob, alice)
        pg.generate_message(data=data, source=src, destination=dst)

    def run_once():
        # reset per run: FormatFinder assigns inferred message types to
        # the messages, and a labeled second run is a different workload
        empty = MessageType("empty")
        for msg in pg.messages:
            msg.message_type = empty
        ff = FormatFinder(pg.messages)
        ff.run(max_iterations=10)
        return ff

    run_once()  # warm: compiles + race-placement verdicts settle

    # Baseline: the identical engines forced onto their host NumPy twins
    # (Cython reference kernels unavailable in this image; the twins
    # implement the same batched algorithms on CPU).
    from urh_tpu.awre import device as awre_device

    def timed(forced_host: bool):
        saved = awre_device.DEVICE_MIN_CELLS
        try:
            if forced_host:
                awre_device.DEVICE_MIN_CELLS = 1 << 62
            t0 = time.perf_counter()
            ff = run_once()
            return time.perf_counter() - t0, ff
        finally:
            awre_device.DEVICE_MIN_CELLS = saved

    timed(True)  # warm the forced-host leg's code paths too
    # INTERLEAVED A/B, ratio of medians: each leg is ~1 s of host-heavy
    # work on a 2-core shared box where background load drifts on
    # multi-second scales — alternating H/A samples cancels the drift
    # that a sequential best-of-2 per side turns into a fake ratio, and
    # medians reject the occasional GC/scheduler outlier that min-of-2
    # hands to whichever side got lucky
    import gc

    # Interleaved A/B, best-of per leg: background load and CPU clock
    # drift on this 2-core box distort single samples by +-30%, but
    # bursts only ever ADD time — with settled placement verdicts the
    # legs run the same algorithms, so the per-leg MINIMA over enough
    # alternating samples converge to the true speeds.  Order
    # alternates (HA/AH) to cancel position bias.
    host_ts, adaptive_ts = [], []
    ff = None
    for i in range(10):
        gc.collect()
        if i % 2 == 0:
            host_ts.append(timed(True)[0])
            t_a, ff = timed(False)
        else:
            t_a, ff = timed(False)
            host_ts.append(timed(True)[0])
        adaptive_ts.append(t_a)
    elapsed = min(adaptive_ts)
    ratio = float(min(host_ts) / elapsed)
    ok = len(ff.message_types) >= 1

    return attach_reference(
        {"metric": "awre_format_finding_1k_msgs",
         "value": round(n_msgs / elapsed, 1), "unit": "messages/s",
         "vs_baseline": round(ratio, 2),
         "baseline": "host NumPy twin of the same engines "
                     f"({len(host_ts)} interleaved A/B pairs, best-of per leg)",
         "host_best_s": round(min(host_ts), 3),
         "adaptive_best_s": round(elapsed, 3),
         "found_types": len(ff.message_types), "valid": ok})


def bench_estimate():
    """Full auto-interpretation estimate() on a synthetic FSK capture."""
    from urh_tpu.ai.estimate import estimate
    from urh_tpu.dsp.modulate import modulate

    rng = np.random.default_rng(7)
    msgs = []
    bits = np.resize(np.array([1, 0, 1, 1, 0, 0, 1, 0], np.uint8), 800)
    for _ in range(24):
        iq = modulate(bits, 100, "fsk", [-20e3, 20e3],
                      carrier_frequency=0.0, sample_rate=1e6, pause=40_000)
        msgs.append(iq)
    capture = np.concatenate(msgs)
    capture += rng.normal(0, 0.01, capture.shape).astype(np.float32)
    n = len(capture)

    # Baseline: the same algorithm forced onto its host NumPy twins
    # (the reference's Cython kernels are unavailable in this image; the
    # NumPy oracle implements the identical pipeline and is FFT/variance
    # bound, so it tracks the reference's CPU cost closely).
    from urh_tpu.ai import device as ai_device

    def timed_once(forced_host: bool):
        saved = (ai_device.DEVICE_MIN_CELLS, ai_device.HISTOGRAM_MIN_VALUES)
        try:
            if forced_host:
                ai_device.DEVICE_MIN_CELLS = 1 << 62
                ai_device.HISTOGRAM_MIN_VALUES = 1 << 62
            t0 = time.perf_counter()
            result = estimate(capture)
            return time.perf_counter() - t0, result
        finally:
            (ai_device.DEVICE_MIN_CELLS,
             ai_device.HISTOGRAM_MIN_VALUES) = saved

    result = timed_once(False)[1]  # warm compile caches
    timed_once(True)
    ok = result.get("modulation_type") == "FSK"
    # interleaved best-of (see bench_sniffer: sequential per-leg
    # windows on this box turn load drift into a fake ratio);
    # alternating order cancels position bias
    t = t_host = float("inf")
    for i in range(8):
        if i % 2 == 0:
            t = min(t, timed_once(False)[0])
            t_host = min(t_host, timed_once(True)[0])
        else:
            t_host = min(t_host, timed_once(True)[0])
            t = min(t, timed_once(False)[0])

    return attach_reference(
        {"metric": "auto_interpretation_estimate",
         "value": round(n / t / 1e6, 1), "unit": "Msamples/s",
         "vs_baseline": round(t_host / t, 2),
         "baseline": "host NumPy twin of the same pipeline "
                     "(interleaved A/B, best-of per leg)",
         "detected_fsk": ok, "samples": n})


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    try:  # persistent compile cache: repeat runs skip the 20-300s compiles
        # (urh_tpu already configures ~/.cache/urh_tpu/xla at import; only
        # set a fallback if nothing is configured, so bench runs SHARE the
        # framework's cache instead of recompiling into a private one)
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/urh_tpu_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    x_host = rng.normal(0, 0.5, (N, 2)).astype(np.float32)
    noise_sqrd = np.float32(1e-4)
    thresholds = np.float32([0.0])

    paths, errors = bench_demod_paths(jax, jnp, partial, x_host, noise_sqrd,
                                      thresholds)

    # FAIL LOUDLY if the production fast path validated but could not be
    # timed: a silent fallback here is how a regression hides.
    if paths.get("states_fast") is None:
        print(json.dumps({
            "metric": "fsk_demod_chain_throughput", "value": 0.0,
            "unit": "Msamples/s", "vs_baseline": 0.0,
            "error": errors.get("states_fast", "states fast path missing"),
            "paths": paths,
        }))
        sys.exit(1)

    timed = {k: v for k, v in paths.items() if v}
    winner = max(timed, key=timed.get)
    device_msps = timed[winner]

    # --- CPU numpy baseline ----------------------------------------------
    # best-of-7: the box runs other jobs, and a loaded run would inflate
    # vs_baseline dishonestly
    numpy_baseline(x_host, noise_sqrd, thresholds)  # warm
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        numpy_baseline(x_host, noise_sqrd, thresholds)
        best = min(best, time.perf_counter() - t0)
    base_msps = N / best / 1e6

    def bench_modulation_subprocess():
        """Run the modulation bench in a fresh process: the TPU client's
        worker threads from earlier sub-benches keep one of this box's
        two cores busy for the rest of THIS process, and the reference
        side (tools/ref_baseline/measure.py) is measured in a dedicated
        process — same conditions on both sides."""
        import subprocess

        code = ("import json, bench; "
                "print(json.dumps(bench.bench_modulation()))")
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=600,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-500:])
        return json.loads(proc.stdout.strip().splitlines()[-1])

    extra = []
    sniffer_result = None
    for fn in (lambda: bench_filter_demod_chain(jax, jnp, partial, x_host,
                                                noise_sqrd),
               bench_modulation_subprocess, bench_sniffer,
               bench_awre_format_finding,
               bench_estimate, bench_simulator_tx_roundtrip):
        try:
            result = fn()
        except Exception as e:  # report, never hide
            result = {"metric": getattr(fn, "__name__", "sub-bench"),
                      "error": f"{type(e).__name__}: {e}"}
        if result.get("metric") == "sniffer_streaming_throughput":
            sniffer_result = result
        extra.append(result)

    # kernel roofline block: the fastest raw demod-chain kernel on device
    # vs the NumPy chain — a compute ceiling, NOT an end-to-end claim
    roofline = {
        "metric": "fsk_demod_chain_throughput",
        "value": round(device_msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(device_msps / base_msps, 2),
        "winner": winner,
        "paths": paths,
        "note": "VMEM-resident dependent-chain kernel roofline",
    }
    if errors:
        roofline["path_errors"] = errors
    extra.append(roofline)

    # HEADLINE: the production-shaped streaming pipeline — chunked ingest
    # through StreamDemodulator (fused demod+symbolize+run-extraction,
    # auto host/device placement) to message segments; a real capture
    # path hits exactly this number (VERDICT r3 #9)
    if sniffer_result is not None and "value" in sniffer_result:
        out = {
            "metric": "stream_pipeline_throughput",
            "value": sniffer_result["value"],
            "unit": "Msamples/s",
            "vs_baseline": sniffer_result.get("vs_baseline"),
            "backend": sniffer_result.get("backend"),
            "extra": extra,
        }
        if "vs_reference" in sniffer_result:
            out["vs_reference"] = sniffer_result["vs_reference"]
            out["reference_value"] = sniffer_result["reference_value"]
    else:  # streaming bench failed: fall back to the roofline headline
        out = dict(roofline)
        out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
