"""Ports of reference tests/test_modulator.py through the Modulator/Signal
file round trip (the reference's test writes to disk and reloads)."""

import array
import os
import time

import numpy as np

from urh_tpu import DemodParams, ProtocolAnalyzer, Signal
from urh_tpu.dsp.modulate import get_oqpsk_bits
from urh_tpu.dsp.modulator import Modulator

MODULATION_DATA = array.array("B", [1, 0, 0, 0, 1, 1, 0, 1])
SPS = 100
PAUSE = 1000


def test_ask_fsk_psk_modulation(tmp_path):
    # test_modulator.py:28-66
    for modulation in ["ASK", "FSK", "PSK"]:
        modulator = Modulator(modulation)
        modulator.modulation_type = modulation
        modulator.samples_per_symbol = SPS
        if modulation == "ASK":
            modulator.parameters[0] = 0
            modulator.parameters[1] = 100
            center = 0.5
        elif modulation == "FSK":
            modulator.parameters[0] = 1000
            modulator.parameters[1] = 2500
            center = 0.0097
        else:
            modulator.parameters[0] = -90
            modulator.parameters[1] = 90
            center = 0

        filename = str(tmp_path / "{}_mod.complex".format(modulation))
        modulator.modulate(MODULATION_DATA, PAUSE).tofile(filename)

        signal = Signal.from_file(filename)
        signal.params = DemodParams(modulation=modulation, samples_per_symbol=SPS,
                                    center=center,
                                    noise_threshold=signal.noise_threshold)
        assert signal.num_samples == len(MODULATION_DATA) * SPS + PAUSE, modulation
        pa = ProtocolAnalyzer(signal)
        pa.get_protocol_from_signal()
        assert len(pa.messages) == 1, modulation
        assert pa.messages[0].plain_bits == MODULATION_DATA, modulation


def test_gfsk(tmp_path):
    # test_modulator.py:68-86: three concatenated GFSK bursts demodulate
    target_file = str(tmp_path / "test.complex")
    modulator = Modulator("gfsk")
    modulator.modulation_type = "GFSK"
    modulator.samples_per_symbol = 100
    modulator.sample_rate = 1e6
    modulator.parameters[1] = 20e3
    modulator.parameters[0] = -10e3
    data1 = modulator.modulate([True, False, False, True, False], 9437).data
    data2 = modulator.modulate([True, False, True], 9845).data
    data3 = modulator.modulate([True, False, True, False], 8458).data
    s = np.concatenate((data1, data2, data3))
    s.tofile(target_file)

    signal = Signal.from_file(target_file)
    signal.params.modulation = "FSK"
    pa = ProtocolAnalyzer(signal)
    pa.get_protocol_from_signal()
    assert len(pa.messages) >= 1


def test_modulation_performance():
    # test_modulator.py:88-94 (0.5s budget in compiled Cython; allow jit
    # warmup by timing the second call)
    modulator = Modulator("Perf")
    modulator.modulation_type = "FSK"
    modulator.modulate([True] * 1000, pause=10_000_000)
    t = time.time()
    modulator.modulate([True] * 1000, pause=10_000_000)
    elapsed = time.time() - t
    assert elapsed < 0.5, elapsed


def test_get_oqpsk_bits():
    # test_modulator.py:118-143: Q stream delayed one symbol
    bits = array.array("B", [1, 1, 0, 1, 0, 0, 1, 0, 0, 1])
    oqpsk_bits = get_oqpsk_bits(np.asarray(bits, dtype=np.uint8))
    assert len(oqpsk_bits) == len(bits) + 2
    assert oqpsk_bits[0] == 1
    assert oqpsk_bits[-1] == 1
    assert list(oqpsk_bits[2:-2]) == [0, 1, 0, 1, 1, 0, 0, 0]
