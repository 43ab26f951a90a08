"""Port of reference tests/cli/test_cli_parsing.py: argparse surface and
the build_*_from_args constructors."""

import tempfile

import pytest

from urh_tpu.cli import main as urh_cli
from urh_tpu.dev.backend_handler import Backends
from urh_tpu.dev.virtual_device import Mode

from tests.golden import get_path_for_data_file


@pytest.fixture
def parser():
    return urh_cli.create_parser()


def test_build_modulator_from_args(parser):
    args = parser.parse_args(
        "--device HackRF --frequency 433.92e6 --sample-rate 2e6 --raw".split())
    assert urh_cli.build_modulator_from_args(args) is None

    args = parser.parse_args(
        "--device HackRF --frequency 433.92e6 --sample-rate 2e6".split())
    with pytest.raises(ValueError):
        urh_cli.build_modulator_from_args(args)

    args = parser.parse_args(
        "--device HackRF --frequency 433.92e6 --sample-rate 2e6 -p0 0".split())
    with pytest.raises(ValueError):
        urh_cli.build_modulator_from_args(args)

    args = parser.parse_args(
        "--device HackRF --frequency 433.92e6 --sample-rate 2e6"
        " -pm 0 1 -mo ASK -cf 1337e3 -ca 0.9 -sps 24 -cp 30".split())
    modulator = urh_cli.build_modulator_from_args(args)
    assert modulator.modulation_type == "ASK"
    assert modulator.sample_rate == 2e6
    assert modulator.samples_per_symbol == 24
    assert modulator.parameters[0] == 0
    assert modulator.parameters[1] == 100
    assert modulator.carrier_freq_hz == 1337e3
    assert modulator.carrier_amplitude == pytest.approx(0.9)
    assert modulator.carrier_phase_deg == 30

    args = parser.parse_args(
        "--device HackRF --frequency 433.92e6 --sample-rate 2e6"
        " -pm 10% 20% -mo ASK -cf 1337e3 -ca 0.9 -sps 24 -cp 30".split())
    modulator = urh_cli.build_modulator_from_args(args)
    assert modulator.parameters[0] == 10
    assert modulator.parameters[1] == 20

    args = parser.parse_args(
        "--device HackRF --frequency 433.92e6 --sample-rate 2e6"
        " -pm 20e3 -20000 -mo FSK -cf 1337e3 -ca 0.9 -sps 24 -cp 30".split())
    modulator = urh_cli.build_modulator_from_args(args)
    assert modulator.modulation_type == "FSK"
    assert modulator.parameters[0] == 20e3
    assert modulator.parameters[1] == -20e3


def test_build_backend_handler_from_args(parser):
    args = parser.parse_args(
        "--device USRP --frequency 433.92e6 --sample-rate 2e6".split())
    bh = urh_cli.build_backend_handler_from_args(args)
    assert bh.device_backends["usrp"].selected_backend == Backends.native

    args = parser.parse_args(
        "--device HackRF --frequency 433.92e6 --sample-rate 2e6"
        " --device-backend native".split())
    bh = urh_cli.build_backend_handler_from_args(args)
    assert bh.device_backends["hackrf"].selected_backend == Backends.native

    args = parser.parse_args(
        "--device RTL-SDR --frequency 433.92e6 --sample-rate 2e6"
        " --device-backend gnuradio".split())
    bh = urh_cli.build_backend_handler_from_args(args)
    assert bh.device_backends["rtl-sdr"].selected_backend == Backends.grc


def test_build_device_from_args(parser):
    args = parser.parse_args(
        "--device HackRF --frequency 133.7e6 --sample-rate 2.5e6 -rx "
        "-if 24 -bb 30 -g 0 --device-identifier abcde".split())
    device = urh_cli.build_device_from_args(args)
    assert device.sample_rate == 2.5e6
    assert device.bandwidth == 2.5e6
    assert device.name == "HackRF"
    assert device.backend == Backends.native
    assert device.frequency == 133.7e6
    assert device.mode == Mode.receive
    assert device.if_gain == 24
    assert device.gain == 0
    assert device.baseband_gain == 30
    assert device.device_serial == "abcde"

    args = parser.parse_args(
        "--device RTL-SDR --frequency 133.7e6 --sample-rate 1e6 "
        "-rx -db native --device-identifier 42".split())
    device = urh_cli.build_device_from_args(args)
    assert device.sample_rate == 1e6
    assert device.name == "RTL-SDR"
    assert device.backend == Backends.native
    assert device.frequency == 133.7e6
    assert device.mode == Mode.receive
    assert device.device_number == 42

    args = parser.parse_args(
        "--device HackRF --frequency 133.7e6 --sample-rate 2.5e6 --bandwidth 5e6 "
        "-tx -db native".split())
    device = urh_cli.build_device_from_args(args)
    assert device.sample_rate == 2.5e6
    assert device.bandwidth == 5e6
    assert device.mode == Mode.send


def test_build_protocol_sniffer_from_args(parser):
    args = parser.parse_args(
        "--device HackRF --frequency 50e3 --sample-rate 2.5e6 -rx "
        "-if 24 -bb 30 -g 0 --device-identifier abcde "
        "-sps 1337 --center 0.5 --noise 0.1234 --tolerance 42 "
        "-cs 0.42 -bps 4".split())
    sniffer = urh_cli.build_protocol_sniffer_from_args(args)
    assert sniffer.rcv_device.frequency == 50e3
    assert sniffer.rcv_device.sample_rate == 2.5e6
    assert sniffer.rcv_device.bandwidth == 2.5e6
    assert sniffer.rcv_device.name.lower() == "hackrf"
    assert sniffer.rcv_device.backend == Backends.native
    assert sniffer.rcv_device.mode == Mode.receive
    assert sniffer.signal.samples_per_symbol == 1337
    assert sniffer.signal.bits_per_symbol == 4
    assert sniffer.signal.center_spacing == pytest.approx(0.42)
    assert sniffer.signal.noise_threshold == pytest.approx(0.1234)
    assert sniffer.signal.center == pytest.approx(0.5)
    assert sniffer.signal.tolerance == 42


def test_build_encoding_from_args(parser):
    args = parser.parse_args(
        '--device HackRF --frequency 50e3 --sample-rate 2.5e6 -e Test,Invert'.split())
    encoding = urh_cli.build_encoding_from_args(args)
    assert len(encoding.chain) == 2


def test_read_messages_to_send(parser):
    args = parser.parse_args(
        "--device HackRF --frequency 50e3 --sample-rate 2e6 -rx".split())
    assert urh_cli.read_messages_to_send(args) is None

    args = parser.parse_args(
        "--device HackRF --frequency 50e3 --sample-rate 2e6 -tx".split())
    with pytest.raises(SystemExit):
        urh_cli.read_messages_to_send(args)

    args = parser.parse_args(
        "--device HackRF --frequency 50e3 --sample-rate 2e6 -tx "
        "-file /tmp/test -m 1111".split())
    with pytest.raises(SystemExit):
        urh_cli.read_messages_to_send(args)

    test_messages = ["101010/1s", "10000/50ms", "00001111/100.5µs",
                     "111010101/500ns", "1111001", "111110000/2000"]
    args = parser.parse_args(
        ("--device HackRF --frequency 50e3 --sample-rate 2e6 -tx --pause 1337 "
         "-m " + " ".join(test_messages)).split())
    messages = urh_cli.read_messages_to_send(args)
    assert len(messages) == len(test_messages)
    assert messages[0].decoded_bits_str == "101010"
    assert messages[0].pause == 2e6
    assert messages[1].decoded_bits_str == "10000"
    assert messages[1].pause == 100e3
    assert messages[2].decoded_bits_str == "00001111"
    assert messages[2].pause == 201
    assert messages[3].decoded_bits_str == "111010101"
    assert messages[3].pause == 1
    assert messages[4].decoded_bits_str == "1111001"
    assert messages[4].pause == 1337
    assert messages[5].decoded_bits_str == "111110000"
    assert messages[5].pause == 2000

    filepath = tempfile.mktemp()
    with open(filepath, "w") as f:
        f.write("aabb/2s")
    args = parser.parse_args(
        ("--device HackRF --frequency 50e3 --sample-rate 2e6 -tx --pause 1337 "
         "--hex -file " + filepath).split())
    messages = urh_cli.read_messages_to_send(args)
    assert len(messages) == 1
    assert messages[0].decoded_bits_str == "1010101010111011"
    assert messages[0].pause == 4e6


def test_parse_project_file():
    import os
    import shutil
    project_file = get_path_for_data_file("TestProjectForCLI.xml")
    tmp_project_file = os.path.join(tempfile.mkdtemp(), "URHProject.xml")
    shutil.copy(project_file, tmp_project_file)
    project_params = urh_cli.parse_project_file(tmp_project_file)
    assert len(project_params) > 0
