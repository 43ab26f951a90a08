"""Vendor SDR device classes: graceful unavailability, parameter maps,
dtype conversion hooks (lib/*.pyx counterparts bound via ctypes)."""

import numpy as np

from urh_tpu.dev import native_devices as nd
from urh_tpu.dev.device import Device


def test_all_devices_importable_and_typed():
    expected = {
        nd.USRP: np.float32, nd.LimeSDR: np.float32, nd.AirSpy: np.float32,
        nd.BladeRF: np.int16, nd.PlutoSDR: np.int16, nd.SDRPlay: np.int16,
        nd.HackRF: np.int8, nd.Rad1o: np.int8, nd.RTLSDR: np.int8,
    }
    for cls, dtype in expected.items():
        assert cls.DATA_TYPE == dtype, cls.__name__


def test_device_method_maps():
    # per-device command remaps mirror the reference Device subclasses
    assert nd.BladeRF.DEVICE_METHODS[Device.Command.SET_RF_GAIN.name] == "set_gain"
    assert nd.LimeSDR.DEVICE_METHODS[Device.Command.SET_RF_GAIN.name] == \
        "set_normalized_gain"
    assert nd.SDRPlay.DEVICE_METHODS[Device.Command.SET_IF_GAIN.name]["rx"] == \
        "set_if_gain"
    # AirSpy has no bandwidth control (AirSpy.py:19)
    assert Device.Command.SET_BANDWIDTH.name not in nd.AirSpy.DEVICE_METHODS


def test_bytes_to_iq_round_trip():
    f32 = np.array([[0.5, -0.5], [1.0, 0.0]], dtype=np.float32)
    for cls in (nd.USRP, nd.LimeSDR, nd.AirSpy):
        assert np.array_equal(cls.bytes_to_iq(f32.tobytes()), f32)
    i16 = np.array([[100, -100], [2047, 0]], dtype=np.int16)
    for cls in (nd.BladeRF, nd.PlutoSDR, nd.SDRPlay):
        assert np.array_equal(cls.bytes_to_iq(i16.tobytes()), i16)


def test_setup_without_library_reports_error():
    class FakeConn:
        def __init__(self):
            self.messages = []

        def send(self, msg):
            self.messages.append(msg)

    for cls in (nd.USRP, nd.LimeSDR, nd.BladeRF, nd.PlutoSDR, nd.AirSpy, nd.SDRPlay):
        if cls.DEVICE_LIB is not None:
            continue  # vendor lib actually present on this machine
        conn = FakeConn()
        assert cls.setup_device(conn, None) is False
        assert len(conn.messages) == 1
        assert conn.messages[0].endswith(":-1")
