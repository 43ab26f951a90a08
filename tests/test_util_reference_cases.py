"""Headless ports of the remaining reference tests/test_util.py cases:
receive buffer sizing, PCAP export, PCAPNG byte-level content checks."""

import copy
import os

import pytest

from urh_tpu import ProtocolAnalyzer, Signal
from urh_tpu.dev import pcapng
from urh_tpu.dev.pcap import PCAP
from urh_tpu.util import settings

from tests.golden import REF_DATA, get_path_for_data_file


def test_get_receive_buffer_size():
    settings.OVERWRITE_RECEIVE_BUFFER_SIZE = None
    ns = settings.get_receive_buffer_size(resume_on_full_receive_buffer=True,
                                          spectrum_mode=True)
    assert ns == settings.SPECTRUM_BUFFER_SIZE

    ns = settings.get_receive_buffer_size(resume_on_full_receive_buffer=True,
                                          spectrum_mode=False)
    assert ns == settings.SNIFF_BUFFER_SIZE

    ns1 = settings.get_receive_buffer_size(resume_on_full_receive_buffer=False,
                                           spectrum_mode=True)
    ns2 = settings.get_receive_buffer_size(resume_on_full_receive_buffer=False,
                                           spectrum_mode=False)
    assert len(str(ns1)) == len(str(ns2))


def _ask_protocol():
    signal = Signal.from_file(get_path_for_data_file("ask.complex"))
    signal.params.modulation = "ASK"
    signal.params.samples_per_symbol = 295
    signal.params.center = -0.1667
    assert signal.num_samples == 13710

    proto_analyzer = ProtocolAnalyzer(signal)
    proto_analyzer.get_protocol_from_signal()
    assert proto_analyzer.decoded_hex_str[0] == "b25b6db6c80"

    for _ in range(3):
        proto_analyzer.messages.append(copy.deepcopy(proto_analyzer.messages[0]))
    return proto_analyzer


@pytest.mark.skipif(REF_DATA is None, reason="reference test data not available")
def test_write_pcap(tmp_path):
    proto_analyzer = _ask_protocol()
    path = str(tmp_path / "test.pcap")
    pcap = PCAP()
    pcap.write_packets(proto_analyzer.messages, path, 1e6)

    with open(path, "rb") as f:
        contents = f.read()
    # libpcap magic (nanosecond variant a1b23c4d or classic a1b2c3d4)
    assert contents[:4] in (b"\x4d\x3c\xb2\xa1", b"\xa1\xb2\x3c\x4d",
                            b"\xd4\xc3\xb2\xa1", b"\xa1\xb2\xc3\xd4")
    assert len(contents) > 24 + 4 * 16


@pytest.mark.skipif(REF_DATA is None, reason="reference test data not available")
def test_write_pcapng(tmp_path):
    proto_analyzer = _ask_protocol()
    filepath = str(tmp_path / "test.pcapng")
    pcapng.create_pcapng_file(filepath, "Universal Radio Hacker Test", "TestHW", 147)
    pcapng.append_packets_to_pcapng(
        filename=filepath,
        packets=(msg.decoded_ascii_buffer for msg in proto_analyzer.messages),
        timestamps=(msg.timestamp for msg in proto_analyzer.messages),
    )

    assert os.path.isfile(filepath)
    with open(filepath, "rb") as f:
        contents = f.read()
    minfilelen = 28 + 20 + 4 * (32 + len(proto_analyzer.messages[0].decoded_ascii_buffer))
    assert len(contents) >= minfilelen
    assert contents.find(b"\x0A\x0D\x0D\x0A") >= 0  # SHB block type
    assert contents.find(proto_analyzer.messages[0].decoded_ascii_buffer) >= 0
