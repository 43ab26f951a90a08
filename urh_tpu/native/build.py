"""On-demand build + ctypes loading of the native library."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

from urh_tpu.util.logging import logger

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_SOURCES = ["ringbuffer.cpp", "net_io.cpp", "dsp_kernels.cpp"]

_lib = None
_build_failed = False


# numerics-relevant flags are part of the cache key: a flag-only change
# (e.g. -ffp-contract) must invalidate previously cached builds
_FLAGS = ["-O3", "-std=c++17", "-ffp-contract=off", "-shared", "-fPIC",
          "-pthread", "-fopenmp"]


def _source_hash() -> str:
    h = hashlib.sha256()
    h.update(" ".join(_FLAGS).encode())
    for name in _SOURCES:
        with open(os.path.join(_SRC_DIR, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _lib_path() -> str:
    cache_dir = os.path.join(tempfile.gettempdir(), "urh_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, "liburh_tpu_{}.so".format(_source_hash()))


def build() -> str:
    """Compile the native library if needed; returns the .so path."""
    path = _lib_path()
    if os.path.isfile(path):
        return path

    sources = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    # -ffp-contract=off: the DSP kernels are exactness-tested against
    # their NumPy twins, which never fuse multiply-adds
    cmd = ["g++"] + _FLAGS + ["-o", path] + sources
    subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=120)
    return path


def get_library():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        lib = ctypes.CDLL(build())
    except (OSError, subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native library unavailable: {}".format(e))
        _build_failed = True
        return None

    lib.urh_ring_init.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.urh_ring_size_bytes.argtypes = [ctypes.c_uint64]
    lib.urh_ring_size_bytes.restype = ctypes.c_uint64
    lib.urh_ring_len.argtypes = [ctypes.c_void_p]
    lib.urh_ring_len.restype = ctypes.c_uint64
    lib.urh_ring_space.argtypes = [ctypes.c_void_p]
    lib.urh_ring_space.restype = ctypes.c_uint64
    lib.urh_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.urh_ring_push.restype = ctypes.c_uint64
    lib.urh_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.urh_ring_pop.restype = ctypes.c_uint64
    lib.urh_ring_clear.argtypes = [ctypes.c_void_p]

    lib.urh_net_rx_start.argtypes = [ctypes.c_void_p, ctypes.c_uint16]
    lib.urh_net_rx_start.restype = ctypes.c_void_p
    lib.urh_net_rx_port.argtypes = [ctypes.c_void_p]
    lib.urh_net_rx_port.restype = ctypes.c_uint16
    lib.urh_net_rx_total_samples.argtypes = [ctypes.c_void_p]
    lib.urh_net_rx_total_samples.restype = ctypes.c_uint64
    lib.urh_net_rx_dropped_samples.argtypes = [ctypes.c_void_p]
    lib.urh_net_rx_dropped_samples.restype = ctypes.c_uint64
    lib.urh_net_rx_stop.argtypes = [ctypes.c_void_p]
    lib.urh_net_send.argtypes = [ctypes.c_char_p, ctypes.c_uint16,
                                 ctypes.c_void_p, ctypes.c_uint64]
    lib.urh_net_send.restype = ctypes.c_int64

    lib.urh_afp_demod_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_float, ctypes.c_float,
                                      ctypes.c_int, ctypes.c_void_p]
    lib.urh_median_full_windows.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                            ctypes.c_int64, ctypes.c_int64,
                                            ctypes.c_void_p]
    lib.urh_mag_squared_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p]
    lib.urh_block_states_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_void_p, ctypes.c_float,
                                         ctypes.c_float, ctypes.c_int,
                                         ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_void_p, ctypes.c_void_p]
    lib.urh_rle_i8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_void_p,
                               ctypes.c_void_p]
    lib.urh_rle_i8.restype = ctypes.c_int64
    lib.urh_median_sliding.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_void_p]

    _lib = lib
    return _lib


def is_available() -> bool:
    return get_library() is not None
