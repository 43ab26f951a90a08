"""Faithfulness check for the native reference build: run the
reference's OWN auto-interpretation integration expectations
(tests/auto_interpretation/test_auto_interpretation_integration.py)
through the shimmed kernels.  If these exact-bitstream gates pass, the
REF_BASELINE.json timings measure a correct reference, not a broken one.

Usage: python tools/ref_baseline/validate.py
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)

from tools.ref_baseline import shim

shim.install()

DATA = "/root/reference/tests/data"


def demodulate(signal_data, mod_type, bit_length, center, noise, tolerance,
               decoding=None, pause_threshold=8):
    """The reference test helper's flow
    (tests/auto_interpretation/auto_interpretation_test_util.py:12-41)."""
    from urh.signalprocessing.IQArray import IQArray
    from urh.signalprocessing.ProtocolAnalyzer import ProtocolAnalyzer
    from urh.signalprocessing.Signal import Signal

    signal = Signal("", "")
    if isinstance(signal_data, IQArray):
        signal.iq_array = signal_data
    elif signal_data.dtype == np.complex64:
        signal.iq_array = IQArray(signal_data.view(np.float32))
    else:
        signal.iq_array = IQArray(signal_data)
    signal.modulation_type = mod_type
    signal.samples_per_symbol = bit_length
    signal.center = center
    signal.noise_threshold = noise
    signal.pause_threshold = pause_threshold
    if tolerance is not None:
        signal.tolerance = tolerance
    pa = ProtocolAnalyzer(signal)
    if decoding is not None:
        pa.decoder = decoding
    pa.get_protocol_from_signal()
    return pa.decoded_hex_str


def main():
    from urh import settings
    from urh.ainterpretation import AutoInterpretation
    from urh.signalprocessing.Encoding import Encoding

    checks = []

    # FSK (integration test :14-33)
    fsk = np.fromfile(os.path.join(DATA, "fsk.complex"), dtype=np.float32)
    r = AutoInterpretation.estimate(fsk)
    assert r["modulation_type"] == "FSK" and r["bit_length"] == 100, r
    assert 0 < r["tolerance"] <= 5
    demod = demodulate(fsk, "FSK", 100, r["center"], r["noise"], r["tolerance"])
    assert demod[0] == "aaaaaaaac626c626f4dc1d98eef7a427999cd239d3f18", demod[0]
    checks.append("fsk.complex: FSK/100 + exact hex")

    # ASK (:35-54)
    ask = np.fromfile(os.path.join(DATA, "ask.complex"), dtype=np.float32)
    r = AutoInterpretation.estimate(ask)
    assert r["modulation_type"] == "ASK" and r["bit_length"] == 300, r
    demod = demodulate(ask, "ASK", 300, r["center"], r["noise"], r["tolerance"])
    assert demod[0] == "b25b6db6c80", demod[0]
    checks.append("ask.complex: ASK/300 + exact hex")

    # EnOcean ASK + WSP decoding (:62-91)
    eno = np.fromfile(os.path.join(DATA, "enocean.complex"), dtype=np.float32)
    r = AutoInterpretation.estimate(eno)
    assert r["modulation_type"] == "ASK" and r["bit_length"] == 40, r
    assert 0.0077 <= r["center"] <= 0.0465
    demod = demodulate(eno, "ASK", 40, r["center"], r["noise"], r["tolerance"],
                       decoding=Encoding(["WSP", settings.DECODING_ENOCEAN]))
    assert len(demod) == 3 and demod[0] == demod[2] == "aa9610002c1c024b", demod
    checks.append("enocean.complex: ASK/40 + WSP decode to aa9610002c1c024b")

    for line in checks:
        print("OK", line)
    print(f"reference shim faithful: {len(checks)} integration gates passed")


if __name__ == "__main__":
    main()
