"""Runtime shims that let the REFERENCE's own Python code
(/root/reference/src/urh) execute headlessly in this image for baseline
measurement:

- fake ``PyQt6`` modules (QtCore/QtGui/QtWidgets) covering the handful
  of symbols the non-GUI reference layers import (Qt namespaces,
  QSettings, QObject, pyqtSignal, QColor),
- ``urh.cythonext.{util,signal_functions,auto_interpretation,awre_util}``
  modules backed by tools/ref_baseline/ref_kernels.cpp (the native build
  of the reference kernels — see that file's header for why Cython
  itself cannot be built here).

Usage:  from tools.ref_baseline import shim; shim.install()
Then ``import urh.awre.FormatFinder`` etc. resolve to the reference tree.
"""

import ctypes
import os
import subprocess
import sys
import tempfile
import types

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF_SRC = "/root/reference/src"
_CPP = os.path.join(_HERE, "ref_kernels.cpp")


def _source_digest() -> str:
    import hashlib

    with open(_CPP, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def build():
    """Compile ref_kernels.cpp on first use.

    The binary is NOT committed; its cache key is the source content
    hash (mtime is meaningless after a fresh clone), so an edited .cpp
    always recompiles and a stale/wrong-arch .so is never loaded.
    """
    so = os.path.join(_HERE, f"ref_kernels-{_source_digest()}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-o", tmp, _CPP],
            check=True)
        os.replace(tmp, so)  # atomic: parallel builders race safely
    return ctypes.CDLL(so)


# ---------------------------------------------------------------------------
# ctypes signatures
# ---------------------------------------------------------------------------

_c = None

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")


def _lib():
    global _c
    if _c is not None:
        return _c
    c = build()
    i64, u64, u32, i32, f32 = (ctypes.c_int64, ctypes.c_uint64,
                               ctypes.c_uint32, ctypes.c_int, ctypes.c_float)
    c.ref_afp_demod.argtypes = [_f32p, i64, f32, i32, i32, f32, _f32p]
    c.ref_modulate.argtypes = [_u8p, i64, ctypes.c_uint32, i32, _f32p,
                               ctypes.c_uint16, f32, f32, f32, f32,
                               ctypes.c_uint32, _f32p]
    c.ref_fir_filter.argtypes = [_f32p, i64, _f32p, i64, _f32p]
    c.ref_grab_pulse_lens.restype = i64
    c.ref_grab_pulse_lens.argtypes = [_f32p, i64, f32, ctypes.c_uint16, i32,
                                      ctypes.c_uint32, i32, _f32p, _i64p]
    c.ref_segment_messages.restype = i64
    c.ref_segment_messages.argtypes = [_f64p, i64, ctypes.c_double, _i64p]
    c.ref_divisor_histogram.argtypes = [_u64p, i64, ctypes.c_double, _u64p]
    c.ref_merge_plateaus.restype = i64
    c.ref_merge_plateaus.argtypes = [_u64p, i64, u64, u64, _u64p]
    c.ref_plateau_lengths.restype = i64
    c.ref_plateau_lengths.argtypes = [_f32p, i64, f32, i32, _u64p]
    c.ref_median_filter.argtypes = [_f64p, i64, ctypes.c_uint, _f32p]
    c.ref_arr_to_number.restype = u64
    c.ref_arr_to_number.argtypes = [_u8p, ctypes.c_uint, i32, ctypes.c_uint]
    c.ref_bit_array_to_number.restype = u64
    c.ref_bit_array_to_number.argtypes = [_u8p, i64, i64]
    c.ref_crc.restype = u64
    c.ref_crc.argtypes = [_u8p, ctypes.c_uint, _u8p, ctypes.c_uint, _u8p,
                          _u8p, i32, i32, i32, i32]
    c.ref_calculate_cache.argtypes = [_u8p, ctypes.c_uint, i32,
                                      ctypes.c_uint, _u64p]
    c.ref_cached_crc.restype = u64
    c.ref_cached_crc.argtypes = [_u64p, ctypes.c_uint, _u8p, ctypes.c_uint,
                                 _u8p, ctypes.c_uint, _u8p, _u8p, i32, i32,
                                 i32, i32]
    c.ref_get_crc_datarange.argtypes = [_u8p, ctypes.c_uint, _u8p,
                                        ctypes.c_uint, u64, _u8p, _u8p, i32,
                                        i32, i32, i32, _u64p]
    c.ref_lcs_indices.restype = i64
    c.ref_lcs_indices.argtypes = [_u8p, ctypes.c_uint, _u8p, ctypes.c_uint,
                                  _u32p]
    c.ref_difference_matrix.argtypes = [_u8p, _i64p, u32, _u32p]
    c.ref_hexvectors.argtypes = [_u8p, _i64p, u32, _u8p, _i64p]
    c.ref_raw_preamble_position.argtypes = [_u8p, i64, _i64p]
    c.ref_find_possible_sync_words.restype = i64
    c.ref_find_possible_sync_words.argtypes = [
        _u32p, _u32p, _u8p, _i64p, u32, i32, _u8p, i64, _i64p, _f64p, i64]
    c.ref_create_difference_histogram.argtypes = [_u8p, _i64p, _i64p, i64,
                                                  _f64p]
    c.ref_find_occurrences.restype = i64
    c.ref_find_occurrences.argtypes = [_u8p, i64, _u8p, i64,
                                       ctypes.c_void_p, i64, i32, _i64p]
    c.ref_seq_number_difference_matrix.argtypes = [_u8p, _i64p, u32, i32,
                                                   i64, _i32p]
    c.ref_check_crc_for_messages.restype = i64
    c.ref_check_crc_for_messages.argtypes = [
        _i64p, i64, _u8p, _i64p, u64, u64, u64, u64, _u8p, ctypes.c_uint,
        _u8p, _u8p, i32, i32, i32, i32, _i64p]
    _c = c
    return c


def _as_u8(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.uint8).reshape(-1))


def _concat(bitvectors):
    """Ragged list -> (concat uint8 buffer, int64 offsets)."""
    vecs = [_as_u8(b) for b in bitvectors]
    offsets = np.zeros(len(vecs) + 1, dtype=np.int64)
    if vecs:
        offsets[1:] = np.cumsum([len(v) for v in vecs])
    concat = (np.concatenate(vecs) if vecs
              else np.zeros(0, np.uint8))
    return np.ascontiguousarray(concat), offsets, vecs


# ---------------------------------------------------------------------------
# fake PyQt6
# ---------------------------------------------------------------------------

class _Namespace:
    """Attribute tree with identity-equal cached leaves (enough for
    Qt.CheckState.Checked style comparisons)."""

    def __init__(self, name="Qt"):
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_children", {})

    def __getattr__(self, item):
        children = object.__getattribute__(self, "_children")
        if item not in children:
            children[item] = _Namespace(f"{self._name}.{item}")
        return children[item]

    def __repr__(self):
        return f"<fake {self._name}>"

    def __hash__(self):
        return id(self)


class _QColor:
    def __init__(self, *args):
        if len(args) >= 3 and all(isinstance(a, int) for a in args[:3]):
            self._rgb = tuple(args[:3])
        else:
            self._rgb = (0, 0, 0)

    @classmethod
    def fromRgb(cls, r=0, g=0, b=0, a=255):
        return cls(r, g, b)

    def red(self):
        return self._rgb[0]

    def green(self):
        return self._rgb[1]

    def blue(self):
        return self._rgb[2]

    def name(self):
        return "#%02x%02x%02x" % self._rgb


class _QSettings:
    Format = _Namespace("QSettings.Format")
    Scope = _Namespace("QSettings.Scope")
    _dir = None

    def __init__(self, *args, **kwargs):
        if _QSettings._dir is None:
            _QSettings._dir = tempfile.mkdtemp(prefix="urh_ref_baseline_")
        self._store = {}

    def fileName(self):
        return os.path.join(_QSettings._dir, "urh.ini")

    def value(self, key, default=None, type=None):
        return self._store.get(key, default)

    def setValue(self, key, value):
        self._store[key] = value

    def sync(self):
        pass

    def contains(self, key):
        return key in self._store


class _FakeSignal:
    def __init__(self, *args, **kwargs):
        pass

    def emit(self, *args, **kwargs):
        pass

    def connect(self, *args, **kwargs):
        pass

    def disconnect(self, *args, **kwargs):
        pass


class _QObject:
    def __init__(self, *args, **kwargs):
        pass


def _fake_pyqt6():
    pyqt6 = types.ModuleType("PyQt6")
    qtcore = types.ModuleType("PyQt6.QtCore")
    qtgui = types.ModuleType("PyQt6.QtGui")
    qtwidgets = types.ModuleType("PyQt6.QtWidgets")

    qtcore.Qt = _Namespace("Qt")
    qtcore.QSettings = _QSettings
    qtcore.QObject = _QObject
    qtcore.pyqtSignal = _FakeSignal
    qtcore.pyqtSlot = lambda *a, **k: (lambda f: f)

    qtgui.QColor = _QColor

    class _AutoMeta(type):
        # class-level attribute access (e.g. QDir.homePath()) yields a
        # callable returning a temp path — inert but string-valued
        def __getattr__(cls, item):
            if item.startswith("__"):
                raise AttributeError(item)
            return lambda *a, **k: tempfile.gettempdir()

    def _auto_class(name):
        # any further Qt class the reference imports becomes an inert stub
        cls = _AutoMeta(name, (), {"__init__": lambda self, *a, **k: None,
                                   "__getattr__": lambda self, item: _Namespace(
                                       f"{name}.{item}")})
        return cls

    def _module_getattr(module_name):
        def module_getattr(item):
            if item.startswith("__"):
                raise AttributeError(item)
            cls = _auto_class(item)
            setattr(sys.modules[module_name], item, cls)
            return cls
        return module_getattr

    qtgui.__getattr__ = _module_getattr("PyQt6.QtGui")
    qtwidgets.__getattr__ = _module_getattr("PyQt6.QtWidgets")
    qtcore.__getattr__ = _module_getattr("PyQt6.QtCore")

    pyqt6.QtCore, pyqt6.QtGui, pyqt6.QtWidgets = qtcore, qtgui, qtwidgets
    sys.modules["PyQt6"] = pyqt6
    sys.modules["PyQt6.QtCore"] = qtcore
    sys.modules["PyQt6.QtGui"] = qtgui
    sys.modules["PyQt6.QtWidgets"] = qtwidgets


# ---------------------------------------------------------------------------
# urh.cythonext shim modules
# ---------------------------------------------------------------------------

def _module_util():
    c = _lib()
    m = types.ModuleType("urh.cythonext.util")

    def minmax(arr):
        arr = np.asarray(arr)
        if arr.size == 0:
            return 0, 0
        return arr.min(), arr.max()

    def get_magnitudes(arr):
        a = np.asarray(arr, dtype=np.float64)
        return np.sqrt(a[:, 0] ** 2 + a[:, 1] ** 2)

    def arr2decibel(arr):
        a = np.asarray(arr)
        return (10.0 * np.log10(a.real ** 2 + a.imag ** 2)).astype(np.float32)

    def bit_array_to_number(bits, end, start=0):
        return int(c.ref_bit_array_to_number(_as_u8(bits), int(end), int(start)))

    def arr_to_number(inpt, reverse=False, start=0):
        b = _as_u8(inpt)
        return int(c.ref_arr_to_number(b, len(b), int(bool(reverse)), int(start)))

    def crc(inpt, polynomial, start_value, final_xor, lsb_first,
            reverse_polynomial, reverse_all, little_endian):
        poly = _as_u8(polynomial)
        return int(c.ref_crc(_as_u8(inpt), len(_as_u8(inpt)), poly, len(poly),
                             _as_u8(start_value), _as_u8(final_xor),
                             int(bool(lsb_first)), int(bool(reverse_polynomial)),
                             int(bool(reverse_all)), int(bool(little_endian))))

    def calculate_cache(polynomial, reverse_polynomial=False, bits=8):
        poly = _as_u8(polynomial)
        cache = np.zeros(1 << int(bits), dtype=np.uint64)
        c.ref_calculate_cache(poly, len(poly), int(bool(reverse_polynomial)),
                              int(bits), cache)
        return cache

    def cached_crc(cache, bits, inpt, polynomial, start_value, final_xor,
                   lsb_first, reverse_polynomial, reverse_all, little_endian):
        poly = _as_u8(polynomial)
        sv = _as_u8(start_value)  # mutated by the reference for tail inputs
        result = int(c.ref_cached_crc(
            np.ascontiguousarray(cache, dtype=np.uint64), int(bits),
            _as_u8(inpt), len(_as_u8(inpt)), poly, len(poly), sv,
            _as_u8(final_xor), int(bool(lsb_first)),
            int(bool(reverse_polynomial)), int(bool(reverse_all)),
            int(bool(little_endian))))
        try:  # propagate the in-place start_value mutation like the .pyx
            for i, v in enumerate(sv):
                start_value[i] = int(v)
        except (TypeError, ValueError):
            pass
        return result

    def get_crc_datarange(inpt, polynomial, vrfy_crc_start, start_value,
                          final_xor, lsb_first, reverse_polynomial,
                          reverse_all, little_endian):
        poly = _as_u8(polynomial)
        out = np.zeros(2, dtype=np.uint64)
        c.ref_get_crc_datarange(_as_u8(inpt), len(_as_u8(inpt)), poly,
                                len(poly), int(vrfy_crc_start),
                                _as_u8(start_value), _as_u8(final_xor),
                                int(bool(lsb_first)),
                                int(bool(reverse_polynomial)),
                                int(bool(reverse_all)),
                                int(bool(little_endian)), out)
        return int(out[0]), int(out[1])

    m.minmax = minmax
    m.get_magnitudes = get_magnitudes
    m.arr2decibel = arr2decibel
    m.bit_array_to_number = bit_array_to_number
    m.arr_to_number = arr_to_number
    m.crc = crc
    m.calculate_cache = calculate_cache
    m.cached_crc = cached_crc
    m.get_crc_datarange = get_crc_datarange
    return m


def _module_signal_functions():
    c = _lib()
    m = types.ModuleType("urh.cythonext.signal_functions")
    mod_ids = {"ASK": 0, "FSK": 1, "PSK": 2}

    def afp_demod(samples, noise_mag, mod_type, mod_order,
                  costas_loop_bandwidth=0.1):
        a = np.asarray(samples)
        if a.dtype != np.float32:
            raise ValueError("baseline shim supports float32 IQ only")
        a = np.ascontiguousarray(a)
        out = np.zeros(len(a), dtype=np.float32)
        c.ref_afp_demod(a, len(a), float(noise_mag), mod_ids[mod_type],
                        int(mod_order), float(costas_loop_bandwidth), out)
        return out

    mod_code = {"ASK": 0, "FSK": 1, "PSK": 2}

    def modulate_c(bits, samples_per_symbol, modulation_type, parameters,
                   bits_per_symbol, carrier_amplitude, carrier_frequency,
                   carrier_phase, sample_rate, pause, start,
                   dtype=np.float32, gauss_bt=0.5, filter_width=1.0):
        if dtype != np.float32:
            raise ValueError("baseline shim supports float32 modulation only")
        if modulation_type not in mod_code:
            raise ValueError(f"shim does not model {modulation_type}")
        b = _as_u8(bits)
        total_symbols = len(b) // int(bits_per_symbol)
        total = total_symbols * int(samples_per_symbol) + int(pause)
        out = np.zeros((total, 2), dtype=np.float32)
        params = np.ascontiguousarray(np.asarray(parameters, dtype=np.float32))
        c.ref_modulate(b, len(b), int(samples_per_symbol),
                       mod_code[modulation_type], params,
                       int(bits_per_symbol), float(carrier_amplitude),
                       float(carrier_frequency), float(carrier_phase),
                       float(sample_rate), int(start), out)
        return out

    def get_center_thresholds(center, spacing, modulation_order):
        # signal_functions.pyx:380-390 exactly (NOT urh_tpu's convention)
        n = modulation_order // 2
        result = np.empty(modulation_order - 1, dtype=np.float32)
        for i in range(0, n):
            result[i] = center - (n - (i + 1)) * spacing
        for i in range(n, modulation_order - 1):
            result[i] = center + (i + 1 - n) * spacing
        return result

    def fir_filter(input_samples, filter_taps):
        a = np.ascontiguousarray(input_samples)
        t = np.ascontiguousarray(filter_taps)
        if a.dtype != np.complex64 or t.dtype != np.complex64:
            raise ValueError("baseline shim expects complex64")
        out = np.zeros(len(a), dtype=np.complex64)
        c.ref_fir_filter(a.view(np.float32), len(a), t.view(np.float32),
                         len(t), out.view(np.float32))
        return out

    def grab_pulse_lens(samples, center, tolerance, modulation_type,
                        samples_per_symbol, bits_per_symbol=1,
                        center_spacing=0.1):
        s = np.ascontiguousarray(samples, dtype=np.float32)
        order = 2 ** int(bits_per_symbol)
        thresholds = np.ascontiguousarray(
            get_center_thresholds(float(center), float(center_spacing), order))
        noise = 0.0 if modulation_type == "ASK" else -4.0
        out = np.zeros((max(1, len(s)), 2), dtype=np.int64)
        n = c.ref_grab_pulse_lens(s, len(s), noise, int(tolerance),
                                  int(modulation_type == "ASK"),
                                  int(samples_per_symbol), order, thresholds,
                                  out)
        return out[:n]

    m.afp_demod = afp_demod
    m.modulate_c = modulate_c
    m.fir_filter = fir_filter
    m.grab_pulse_lens = grab_pulse_lens
    m.get_center_thresholds = get_center_thresholds
    return m


def _module_auto_interpretation():
    c = _lib()
    m = types.ModuleType("urh.cythonext.auto_interpretation")

    def segment_messages_from_magnitudes(magnitudes, noise_threshold):
        a = np.ascontiguousarray(np.asarray(magnitudes, dtype=np.float64))
        out = np.zeros(2 * (len(a) // 20 + 2), dtype=np.int64)
        n = c.ref_segment_messages(a, len(a), float(noise_threshold), out)
        return [(int(out[2 * i]), int(out[2 * i + 1])) for i in range(n)]

    def get_threshold_divisor_histogram(plateau_lengths, threshold=0.2):
        pl = np.ascontiguousarray(np.asarray(plateau_lengths, dtype=np.uint64))
        if len(pl) == 0:
            return np.zeros(1, dtype=np.uint64)
        hist = np.zeros(int(pl.max()) + 1, dtype=np.uint64)
        c.ref_divisor_histogram(pl, len(pl), float(threshold), hist)
        return hist

    def merge_plateaus(plateaus, tolerance, max_count):
        p = np.ascontiguousarray(np.asarray(plateaus, dtype=np.uint64))
        if len(p) == 0:
            return np.zeros(0, dtype=np.uint64)
        out = np.empty(len(p), dtype=np.uint64)
        n = c.ref_merge_plateaus(p, len(p), int(tolerance), int(max_count), out)
        return out[:n]

    def get_plateau_lengths(rect_data, center, percentage=25):
        if center is None:
            return np.array([], dtype=np.uint64)
        r = np.ascontiguousarray(np.asarray(rect_data, dtype=np.float32))
        if len(r) == 0:
            return np.array([], dtype=np.uint64)
        out = np.empty(len(r), dtype=np.uint64)
        n = c.ref_plateau_lengths(r, len(r), float(center), int(percentage), out)
        return out[:n]

    def median_filter(data, k=3):
        d = np.ascontiguousarray(np.asarray(data, dtype=np.float64))
        out = np.zeros(len(d), dtype=np.float32)
        c.ref_median_filter(d, len(d), int(k), out)
        return out

    def k_means(data, k=2):
        # auto_interpretation.pyx:13-52 — iterative Lloyd on unique seeds;
        # not on the measured paths, provided for import completeness
        data = np.asarray(data, dtype=np.float32)
        unique = set(float(x) for x in data)
        k = min(k, len(unique))
        centers = np.array([unique.pop() for _ in range(k)], dtype=np.float32)
        while True:
            idx = np.argmin((centers[None, :] - data[:, None]) ** 2, axis=1)
            clusters = [data[idx == i] for i in range(k)]
            new = np.array([cl.mean() if len(cl) else centers[i]
                            for i, cl in enumerate(clusters)], np.float32)
            if float(np.sum(centers ** 2 - new ** 2)) == 0.0:
                return new, [list(cl) for cl in clusters]
            centers = new

    m.segment_messages_from_magnitudes = segment_messages_from_magnitudes
    m.get_threshold_divisor_histogram = get_threshold_divisor_histogram
    m.merge_plateaus = merge_plateaus
    m.get_plateau_lengths = get_plateau_lengths
    m.median_filter = median_filter
    m.k_means = k_means
    return m


def _module_awre_util():
    c = _lib()
    m = types.ModuleType("urh.cythonext.awre_util")

    def find_longest_common_sub_sequence_indices(seq1, seq2):
        s1, s2 = _as_u8(seq1), _as_u8(seq2)
        out = np.zeros(20, dtype=np.uint32)
        n = c.ref_lcs_indices(s1, len(s1), s2, len(s2), out)
        return {(int(out[2 * i]), int(out[2 * i + 1])) for i in range(n)}

    def find_first_difference(bits1, bits2, len1=None, len2=None):
        b1, b2 = _as_u8(bits1), _as_u8(bits2)
        n = min(len(b1), len(b2))
        diff = np.flatnonzero(b1[:n] != b2[:n])
        return int(diff[0]) if len(diff) else n

    def get_difference_matrix(bitvectors):
        concat, offsets, _ = _concat(bitvectors)
        N = len(bitvectors)
        out = np.zeros((N, N), dtype=np.uint32)
        c.ref_difference_matrix(concat, offsets, N, out)
        return out

    def get_hexvectors(bitvectors):
        concat, offsets, vecs = _concat(bitvectors)
        lens = np.asarray([-(-len(v) // 4) for v in vecs], dtype=np.int64)
        out_offsets = np.zeros(len(vecs) + 1, dtype=np.int64)
        out_offsets[1:] = np.cumsum(lens)
        out = np.zeros(int(out_offsets[-1]), dtype=np.uint8)
        c.ref_hexvectors(concat, offsets, len(vecs), out, out_offsets)
        return [out[out_offsets[i]:out_offsets[i + 1]].copy()
                for i in range(len(vecs))]

    def get_raw_preamble_position(bitvector):
        b = _as_u8(bitvector)
        out = np.zeros(3, dtype=np.int64)
        c.ref_raw_preamble_position(b, len(b), out)
        return int(out[0]), int(out[1]), int(out[2])

    def find_possible_sync_words(difference_matrix, raw_preamble_positions,
                                 bitvectors, n_gram_length):
        concat, offsets, _ = _concat(bitvectors)
        dm = np.ascontiguousarray(difference_matrix, dtype=np.uint32)
        rp = np.ascontiguousarray(raw_preamble_positions, dtype=np.uint32)
        max_entries = 4096
        max_word_bytes = 1 << 22
        words = np.zeros(max_word_bytes, dtype=np.uint8)
        word_lens = np.zeros(max_entries, dtype=np.int64)
        scores = np.zeros(max_entries, dtype=np.float64)
        n = c.ref_find_possible_sync_words(
            dm, rp, concat, offsets, dm.shape[0], int(n_gram_length), words,
            max_word_bytes, word_lens, scores, max_entries)
        result = {}
        pos = 0
        for i in range(n):
            ln = int(word_lens[i])
            result[bytes(words[pos:pos + ln])] = float(scores[i])
            pos += ln
        return result

    def create_difference_histogram(vectors, active_indices):
        concat, offsets, _ = _concat(vectors)
        active = np.ascontiguousarray(
            np.asarray(list(active_indices), dtype=np.int64))
        if len(active) == 0:
            return np.zeros(0, dtype=np.float64)
        longest = max(int(offsets[i + 1] - offsets[i]) for i in active)
        hist = np.zeros(longest, dtype=np.float64)
        c.ref_create_difference_histogram(concat, offsets, active,
                                          len(active), hist)
        return hist

    def find_occurrences(a, b, ignore_indices=None, return_after_first=False):
        aa, bb = _as_u8(a), _as_u8(b)
        out = np.zeros(max(1, len(aa)), dtype=np.int64)
        if ignore_indices is not None:
            ign = np.ascontiguousarray(
                np.asarray(list(ignore_indices), dtype=np.uint64))
            ign_ptr = ign.ctypes.data_as(ctypes.c_void_p)
            n_ign = len(ign)
        else:
            ign_ptr, n_ign = None, 0
        n = c.ref_find_occurrences(aa, len(aa), bb, len(bb), ign_ptr, n_ign,
                                   int(bool(return_after_first)), out)
        return [int(x) for x in out[:n]]

    def create_seq_number_difference_matrix(bitvectors, n_gram_length):
        concat, offsets, vecs = _concat(bitvectors)
        max_len = max(len(v) for v in vecs)
        M = -(-max_len // n_gram_length)
        out = np.full((len(vecs) - 1, M), -1, dtype=np.int32)
        c.ref_seq_number_difference_matrix(concat, offsets, len(vecs),
                                           int(n_gram_length), M, out)
        return out

    def check_crc_for_messages(message_indices, bitvectors, data_start,
                               data_stop, crc_start, crc_stop, crc_polynomial,
                               crc_start_value, crc_final_xor, crc_lsb_first,
                               crc_reverse_polynomial, crc_reverse_all,
                               crc_little_endian):
        concat, offsets, _ = _concat(bitvectors)
        indices = np.ascontiguousarray(
            np.asarray(list(message_indices), dtype=np.int64))
        poly = _as_u8(crc_polynomial)
        out = np.zeros(max(1, len(indices)), dtype=np.int64)
        n = c.ref_check_crc_for_messages(
            indices, len(indices), concat, offsets, int(data_start),
            int(data_stop), int(crc_start), int(crc_stop), poly, len(poly),
            _as_u8(crc_start_value), _as_u8(crc_final_xor),
            int(bool(crc_lsb_first)), int(bool(crc_reverse_polynomial)),
            int(bool(crc_reverse_all)), int(bool(crc_little_endian)), out)
        return {int(x) for x in out[:n]}

    m.find_longest_common_sub_sequence_indices = \
        find_longest_common_sub_sequence_indices
    m.find_first_difference = find_first_difference
    m.get_difference_matrix = get_difference_matrix
    m.get_hexvectors = get_hexvectors
    m.get_raw_preamble_position = get_raw_preamble_position
    m.find_possible_sync_words = find_possible_sync_words
    m.create_difference_histogram = create_difference_histogram
    m.find_occurrences = find_occurrences
    m.create_seq_number_difference_matrix = create_seq_number_difference_matrix
    m.check_crc_for_messages = check_crc_for_messages
    return m


_installed = False


def install():
    """Register the shims and put the reference tree on sys.path."""
    global _installed
    if _installed:
        return
    _fake_pyqt6()
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)

    cythonext = types.ModuleType("urh.cythonext")
    util_m = _module_util()
    sf_m = _module_signal_functions()
    ai_m = _module_auto_interpretation()
    awre_m = _module_awre_util()

    # GUI-only kernel module: importable, but unused on the measured paths
    pc_m = types.ModuleType("urh.cythonext.path_creator")

    def _pc_stub(*args, **kwargs):
        raise NotImplementedError(
            "path_creator is GUI-only and not part of the baseline shim")

    pc_m.create_path = _pc_stub
    pc_m.create_live_path = _pc_stub
    pc_m.array_to_QPath = _pc_stub

    cythonext.util = util_m
    cythonext.signal_functions = sf_m
    cythonext.auto_interpretation = ai_m
    cythonext.awre_util = awre_m
    cythonext.path_creator = pc_m
    sys.modules["urh.cythonext"] = cythonext
    sys.modules["urh.cythonext.util"] = util_m
    sys.modules["urh.cythonext.signal_functions"] = sf_m
    sys.modules["urh.cythonext.auto_interpretation"] = ai_m
    sys.modules["urh.cythonext.awre_util"] = awre_m
    sys.modules["urh.cythonext.path_creator"] = pc_m
    _installed = True
