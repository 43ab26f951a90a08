"""Formatter, external-program encodings, signal filter_range."""

import sys

import numpy as np
import pytest

import urh_tpu as ut
from urh_tpu.coding.encodings import (DECODING_EXTERNAL, Encoding, str2bit)
from urh_tpu.dsp.filters import Filter, FilterType
from urh_tpu.util.formatter import Formatter

from tests.golden import get_path_for_data_file


def test_formatter():
    assert Formatter.big_value_with_suffix(433.92e6).startswith("433")
    assert Formatter.big_value_with_suffix(433.92e6).endswith("M")
    assert Formatter.big_value_with_suffix(2e3) == "2K"
    assert Formatter.science_time(1e-4).endswith("s")
    assert "µ" in Formatter.science_time(1e-4)
    assert Formatter.str2val("42", int) == 42
    assert Formatter.str2val("nope", int, 7) == 7


def test_external_program_encoding():
    decoder = get_path_for_data_file("decode.py")
    encoder = get_path_for_data_file("encode.py")

    e = Encoding(["external test", DECODING_EXTERNAL,
                  "{0} {1};{0} {2}".format(sys.executable, decoder, encoder)])

    data = str2bit("10010110")
    encoded = e.encode(data)
    assert list(encoded) == list(str2bit("1100001100111100"))  # doubled bits
    decoded = e.decode(encoded)
    assert list(decoded) == list(data)


def test_signal_filter_range():
    sig = ut.Signal.from_file(get_path_for_data_file("fsk.complex"))
    sig.modulation_type = "FSK"
    sig.samples_per_symbol = 100
    sig.center = 0
    _ = sig.qad  # populate cache

    original = np.array(sig.iq_array[1000:1200])
    f = Filter(Filter.design_windowed_sinc_lpf(0.1, bw=0.05), FilterType.custom)
    sig.filter_range(1000, 1200, f)
    assert not np.array_equal(np.array(sig.iq_array[1000:1200]), original)
    # outside the range stays untouched
    assert sig.num_samples > 1200


def test_moving_average_filter_type():
    f = Filter([0.25] * 4, FilterType.moving_average)
    x = np.ones((32, 2), dtype=np.float32)  # interleaved 1+1j samples
    y = f.work(x)
    np.testing.assert_allclose(y.real[8:], 1.0, atol=1e-4)
    np.testing.assert_allclose(y.imag[8:], 1.0, atol=1e-4)


def test_stage_metrics():
    from urh_tpu.util.metrics import StageMetrics

    m = StageMetrics()
    with m.measure("demod", 1000):
        pass
    with m.measure("demod", 2000):
        pass
    rep = m.report()
    assert rep["demod"]["samples"] == 3000
    assert rep["demod"]["calls"] == 2
    assert m.throughput("demod") > 0
    m.clear()
    assert m.report() == {}


def test_file_operator():
    import os
    import tempfile

    from urh_tpu.util.file_operator import (get_name_from_filename, save_signal,
                                            uncompress_archives)

    assert get_name_from_filename("/a/b/test.complex") == "test"

    sig = ut.Signal.from_iq(np.zeros((16, 2), dtype=np.float32))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.complex")
        save_signal(sig, path)
        assert os.path.getsize(path) == 16 * 8

        import tarfile
        tar_path = os.path.join(d, "a.tar")
        with tarfile.open(tar_path, "w") as tar:
            tar.add(path, arcname="inner.complex")
        out = uncompress_archives([tar_path], d)
        assert any(p.endswith("inner.complex") for p in out)


def test_minmax_and_arr_to_number():
    from urh_tpu.util.misc import arr_to_number, minmax

    assert minmax([]) == (0, 0)
    assert minmax([3.5, -1.25, 7.0]) == (-1.25, 7.0)

    # cythonext/util.pyx:63-73 semantics
    assert arr_to_number([1, 0, 1, 1]) == 0b1011
    assert arr_to_number([1, 0, 1, 1], reverse=True) == 0b1101
    assert arr_to_number([1, 0, 1, 1], start=2) == 0b11
