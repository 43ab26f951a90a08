"""Ports of the reference external-decoder edge cases
(tests/test_encoding.py:216-328): external programs in directories with
spaces, with extra arguments, and run through an explicit interpreter."""

import array
import os
import shutil
import sys

from urh_tpu.coding.encodings import Encoding
from urh_tpu.util import settings

from tests.golden import get_path_for_data_file

DATA = array.array("B", [1, 0, 1, 0, 0, 1, 1])
EXPECTED = array.array("B", [1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1])


def _roundtrip(encoding: Encoding):
    encoded = encoding.encode(DATA)
    assert encoded == EXPECTED
    assert encoding.decode(encoded) == DATA


def test_external_in_dir_with_spaces(tmp_path):
    dir_with_spaces = tmp_path / "directory" / "with space"
    dir_with_spaces.mkdir(parents=True)
    encoder = shutil.copy(get_path_for_data_file("encode.py"),
                          dir_with_spaces / "encode.py")
    decoder = shutil.copy(get_path_for_data_file("decode.py"),
                          dir_with_spaces / "decode.py")
    encoder_cmd = '{} "{}"'.format(sys.executable, encoder)
    decoder_cmd = '{} "{}"'.format(sys.executable, decoder)

    e = Encoding(["test external with spaces", settings.DECODING_EXTERNAL,
                  decoder_cmd + ";" + encoder_cmd])
    _roundtrip(e)


def test_external_with_arguments(tmp_path):
    dir_with_spaces = tmp_path / "directory" / "with space"
    dir_with_spaces.mkdir(parents=True)
    coder = shutil.copy(get_path_for_data_file("code.py"),
                        dir_with_spaces / "code.py")
    # code.py shells out to its sibling encode.py / decode.py
    shutil.copy(get_path_for_data_file("encode.py"), dir_with_spaces / "encode.py")
    shutil.copy(get_path_for_data_file("decode.py"), dir_with_spaces / "decode.py")
    coder_cmd = '{} "{}"'.format(sys.executable, coder)

    e = Encoding(["test external with args", settings.DECODING_EXTERNAL,
                  coder_cmd + " d" + ";" + coder_cmd + " e"])
    _roundtrip(e)


def test_external_with_interpreter(tmp_path):
    dir_with_spaces = tmp_path / "directory" / "with extra space"
    dir_with_spaces.mkdir(parents=True)
    coder = shutil.copy(get_path_for_data_file("code.py"),
                        dir_with_spaces / "code.py")
    shutil.copy(get_path_for_data_file("encode.py"), dir_with_spaces / "encode.py")
    shutil.copy(get_path_for_data_file("decode.py"), dir_with_spaces / "decode.py")
    coder_cmd = '{} "{}"'.format(sys.executable, coder)

    e = Encoding(["test external with interpreter", settings.DECODING_EXTERNAL,
                  coder_cmd + " d" + ";" + coder_cmd + " e"])
    _roundtrip(e)
