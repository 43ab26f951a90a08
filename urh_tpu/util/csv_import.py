"""CSV signal import: oscilloscope/logic-analyzer CSV exports -> IQ.

Counterpart of the parsing core of
urh/controller/dialogs/CSVImportDialog.py:125-190 (GUI preview replaced
by the library API): configurable separator and I/Q/timestamp columns,
amplitude normalization by the peak, sample-rate estimation from the
first PREVIEW_ROWS timestamp deltas.
"""

from __future__ import annotations

import csv

import numpy as np

PREVIEW_ROWS = 100


def parse_csv_line(csv_line, i_data_col: int, q_data_col: int, timestamp_col: int):
    """One parsed row dict or None on malformed/comment lines
    (CSVImportDialog.py:125-153)."""
    result = dict()

    if i_data_col >= 0:
        try:
            result["I"] = float(csv_line[i_data_col])
        except (ValueError, IndexError):
            return None
    else:
        result["I"] = 0.0

    if q_data_col >= 0:
        try:
            result["Q"] = float(csv_line[q_data_col])
        except (ValueError, IndexError):
            return None
    else:
        result["Q"] = 0.0

    if timestamp_col >= 0:
        try:
            result["T"] = float(csv_line[timestamp_col])
        except (ValueError, IndexError):
            return None

    return result


def estimate_sample_rate(timestamps):
    """Mean delta of the first PREVIEW_ROWS timestamps
    (CSVImportDialog.py:177-190)."""
    if timestamps is None or len(timestamps) < 2:
        return None

    previous_timestamp = timestamps[0]
    durations = []
    for timestamp in timestamps[1:PREVIEW_ROWS]:
        durations.append(abs(timestamp - previous_timestamp))
        previous_timestamp = timestamp

    return 1 / (sum(durations) / len(durations))


def parse_csv_file(filename: str, separator: str, i_data_col: int,
                   q_data_col: int = -1, t_data_col: int = -1):
    """-> (complex64 samples normalized to peak 1.0, estimated sample rate
    or None) (CSVImportDialog.py:155-175)."""
    iq_data = []
    timestamps = [] if t_data_col > -1 else None
    with open(filename, encoding="utf-8-sig") as f:
        csv_reader = csv.reader(f, delimiter=separator)
        for line in csv_reader:
            parsed = parse_csv_line(line, i_data_col, q_data_col, t_data_col)
            if parsed is None:
                continue
            iq_data.append(complex(parsed["I"], parsed["Q"]))
            if timestamps is not None:
                timestamps.append(parsed["T"])

    iq_data = np.asarray(iq_data, dtype=np.complex64)
    sample_rate = estimate_sample_rate(timestamps)
    if len(iq_data):
        iq_data = iq_data / abs(iq_data.max())
    return iq_data, sample_rate


def csv_to_signal(filename: str, separator: str = ",", i_data_col: int = 1,
                  q_data_col: int = -1, t_data_col: int = -1):
    """Convenience: parse a CSV capture straight into a Signal."""
    from urh_tpu.core.signal import Signal

    data, sample_rate = parse_csv_file(filename, separator, i_data_col,
                                       q_data_col, t_data_col)
    return Signal.from_samples(data, filename, sample_rate or 1e6)
