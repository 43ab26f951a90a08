"""Port of the parsing semantics covered by reference
tests/test_csv_import_dialog.py (headless)."""

import random

import numpy as np

from urh_tpu.util import csv_import


def write_csv(path, sep=","):
    with open(path, "w") as f:
        f.write("this is a comment\n")
        f.write("format is\n")
        f.write("Timestamp I Q Trash\n")
        for i in range(150):
            f.write("{}{sep}{}{sep}{}{sep}{}\n".format(
                i / 1e6, i, random.uniform(0, 1), 42 * i, sep=sep))


def test_comma_separated_file(tmp_path):
    path = str(tmp_path / "comma.csv")
    random.seed(0)
    write_csv(path)

    data, sample_rate = csv_import.parse_csv_file(path, ",", i_data_col=1,
                                                  q_data_col=2, t_data_col=0)
    # comment lines are dropped, 150 data rows survive
    assert len(data) == 150
    # normalized so the peak magnitude is 1.0
    assert abs(abs(data).max() - 1.0) < 1e-6
    # timestamps step 1us -> 1MHz
    assert abs(sample_rate - 1e6) < 1


def test_semicolon_and_invalid_lines(tmp_path):
    path = str(tmp_path / "semi.csv")
    random.seed(1)
    write_csv(path, sep=";")

    data, sample_rate = csv_import.parse_csv_file(path, ";", i_data_col=1,
                                                  q_data_col=2, t_data_col=0)
    assert len(data) == 150
    assert abs(sample_rate - 1e6) < 1

    # wrong separator: every line malformed -> empty result, no crash
    data2, rate2 = csv_import.parse_csv_file(path, ",", i_data_col=1,
                                             q_data_col=2, t_data_col=0)
    assert len(data2) == 0
    assert rate2 is None


def test_i_only_and_signal(tmp_path):
    path = str(tmp_path / "ionly.csv")
    with open(path, "w") as f:
        for i in range(64):
            f.write("{}\n".format(np.sin(2 * np.pi * i / 8)))

    data, rate = csv_import.parse_csv_file(path, ",", i_data_col=0)
    assert len(data) == 64
    assert rate is None
    assert np.allclose(data.imag, 0)

    signal = csv_import.csv_to_signal(path, i_data_col=0)
    assert signal.num_samples == 64
    assert signal.sample_rate == 1e6  # fallback


def test_parse_reference_sigrok_csv():
    """The reference's csvtest.csv (libsigrok export with BOM + comment
    header): junk rows drop via the NaN mask, both channels parse."""
    import os

    path = os.environ.get("URH_TPU_REF_DATA",
                          "/root/reference/tests/data") + "/csvtest.csv"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference test data not available")
    data, rate = csv_import.parse_csv_file(path, ",", i_data_col=0,
                                           q_data_col=1)
    assert len(data) == 100  # 105 lines minus 5 header/comment rows
    assert np.abs(data).max() <= 1.0 + 1e-6  # normalized to the peak
    assert rate is None
