"""Headless ports: reference tests/test_file_operator.py (save_wav,
uncompress_archives) and tests/test_protocol_analyzer.py::test_binary_format."""

import os
import tarfile
from zipfile import ZipFile

import numpy as np

from urh_tpu.protocol.analyzer import ProtocolAnalyzer
from urh_tpu.protocol.message import Message
from urh_tpu.util import file_operator as FileOperator


def test_save_wav(tmp_path):
    path = str(tmp_path / "test.wav")
    assert not os.path.isfile(path)
    FileOperator.save_data(np.array([1, 2], dtype=np.int16), path)
    assert os.path.isfile(path)
    with open(path, "rb") as f:
        assert f.read(4) == b"RIFF"


def test_uncompress_archives(tmp_path):
    os.chdir(tmp_path)
    with tarfile.open("test.tar.gz", "w:gz") as tar:
        for name in ["1.complex", "2.complex", "3.complex"]:
            np.ones(10, dtype=np.complex64).tofile(name)
            tar.add(name)
    with ZipFile("test.zip", "w") as zipf:
        for name in ["4.complex", "5.complex"]:
            np.ones(20, dtype=np.complex64).tofile(name)
            zipf.write(name)

    extract_dir = str(tmp_path / "out")
    os.makedirs(extract_dir)
    extracted = FileOperator.uncompress_archives(["test.tar.gz", "test.zip"],
                                                 extract_dir)
    assert len(extracted) == 5
    for path in extracted:
        assert os.path.isfile(path)
    assert len(np.fromfile(extracted[0], dtype=np.complex64)) == 10
    assert len(np.fromfile(extracted[4], dtype=np.complex64)) == 20


def test_binary_format(tmp_path):
    # test_protocol_analyzer.py:63-79
    pa = ProtocolAnalyzer(None)
    pa.messages.append(Message([1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 1, 1, 0, 1, 1],
                               0, pa.default_message_type))
    pa.messages.append(Message([1, 1, 1, 0, 1], 0, pa.default_message_type))

    filename = str(tmp_path / "test_proto.bin")
    pa.to_binary(filename, use_decoded=True)

    pa.from_binary(filename)
    assert len(pa.messages) == 3
    assert pa.plain_bits_str[2] == "111000111001101111101000"
