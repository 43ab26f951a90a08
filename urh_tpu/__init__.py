"""urh_tpu — a TPU-native software-radio framework.

A from-scratch reimplementation of the capabilities of Universal Radio
Hacker (jopohl/urh) designed for TPU hardware: the sample-rate compute
path (demodulation, modulation, filtering, spectral analysis, automatic
modulation-parameter estimation) runs as JAX/XLA/Pallas programs that
vectorize onto the VPU/MXU and shard across device meshes, while the
protocol layer (messages, encodings, CRC reverse engineering, protocol
reverse engineering, simulation) runs on the host over device-computed
primitives.

Quick start::

    import urh_tpu as ut

    sig = ut.Signal.from_file("capture.complex")
    params = ut.estimate(sig)                  # auto-detect modulation params
    messages = ut.demodulate(sig, params)      # -> list of bit messages
"""

import os as _os

if _os.environ.get("URH_TPU_PLATFORM"):
    # explicit platform selection that works even when a device plugin
    # overrides JAX_PLATFORMS
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["URH_TPU_PLATFORM"])

try:
    # Persistent XLA compilation cache: kernel programs compile once per
    # machine instead of once per process.  Crucial on relay-attached
    # devices where a single compile round-trip costs seconds; harmless
    # (and still a startup win) everywhere else.  Opt out by setting
    # URH_TPU_NO_COMPILE_CACHE.
    if not _os.environ.get("URH_TPU_NO_COMPILE_CACHE"):
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            _cache = _os.path.join(
                _os.path.expanduser("~"), ".cache", "urh_tpu", "xla")
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from urh_tpu.core.iq import IQData
from urh_tpu.core.signal import Signal
from urh_tpu.dsp.demod import DemodParams, afp_demod
from urh_tpu.protocol.analyzer import ProtocolAnalyzer, demodulate
from urh_tpu.ai.estimate import estimate

__version__ = "0.1.0"

__all__ = [
    "IQData",
    "Signal",
    "DemodParams",
    "afp_demod",
    "ProtocolAnalyzer",
    "demodulate",
    "estimate",
]
