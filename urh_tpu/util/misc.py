"""Small shared helpers (bit-string conversions, command helpers).

Counterparts of pieces of urh/util/util.py used across subsystems.
"""

from __future__ import annotations

import os
import shlex
import shutil
import subprocess

BCD_ERROR_SYMBOL = "?"
BCD_LUT = {"{0:04b}".format(i): str(i) if i < 10 else BCD_ERROR_SYMBOL for i in range(16)}

PROJECT_PATH = None


def convert_bits_to_string(bits, output_view_type: int, pad_zeros=False, lsb=False,
                           lsd=False, endianness="big"):
    """0 = bit, 1 = hex, 2 = ascii, 3 = decimal, 4 = BCD."""
    bits_str = "".join("1" if b else "0" for b in bits)

    if output_view_type == 4:
        pad_zeros = True  # BCD needs nibble padding

    if pad_zeros and output_view_type in (1, 2, 4):
        n = 4 if output_view_type in (1, 4) else 8 if output_view_type == 2 else 1
        bits_str += "0" * ((n - (len(bits_str) % n)) % n)

    if lsb:
        bits_str = bits_str[::-1]

    if endianness == "little":
        bits_str = "".join(bits_str[max(i - 8, 0) : i] for i in range(len(bits_str), 0, -8))

    if output_view_type == 0:
        result = bits_str
    elif output_view_type == 1:
        result = "".join("{0:x}".format(int(bits_str[i : i + 4], 2))
                         for i in range(0, len(bits_str), 4))
    elif output_view_type == 2:
        result = "".join(map(chr, [int(bits_str[i : i + 8], 2)
                                   for i in range(0, len(bits_str), 8)]))
    elif output_view_type == 3:
        try:
            result = str(int(bits_str, 2))
        except ValueError:
            return None
    elif output_view_type == 4:
        result = "".join(BCD_LUT[bits_str[i : i + 4]] for i in range(0, len(bits_str), 4))
    else:
        raise ValueError("unknown view type")

    return result[::-1] if lsd else result


def parse_command(command: str):
    try:
        splitted = shlex.split(command, posix=True)
    except ValueError:
        splitted = []
    if len(splitted) == 0:
        return "", []
    cmd = splitted.pop(0)
    if PROJECT_PATH is not None and not os.path.isabs(cmd) and os.path.exists(
        os.path.join(PROJECT_PATH, cmd)
    ):
        cmd = os.path.join(PROJECT_PATH, cmd)
    return cmd, splitted


def validate_command(command: str) -> bool:
    if not isinstance(command, str):
        return False
    cmd, _ = parse_command(command)
    return shutil.which(cmd) is not None


def run_command(command, param: str = None, use_stdin=False, detailed_output=False,
                return_rc=False):
    cmd, args = parse_command(command)
    if shutil.which(cmd) is None:
        return ("", 1) if return_rc else ""

    call_args = [cmd] + args
    if param is not None and not use_stdin:
        call_args.append(param)

    try:
        proc = subprocess.run(call_args, input=param if use_stdin else None,
                              capture_output=True, text=True, timeout=60)
        rc = proc.returncode
        if detailed_output:
            out = "{} exited with {} ({})".format(
                os.path.basename(cmd), rc, (proc.stdout + proc.stderr).strip())
        else:
            out = proc.stdout.strip()
    except (OSError, subprocess.SubprocessError) as e:
        out, rc = str(e), 1

    return (out, rc) if return_rc else out


# -- tiny HTML log formatting (urh/util/HTMLFormatter.py) -------------------

INDENT_WIDTH_PX = 20


def monospace(string):
    return "<samp>" + string + "</samp>"


def indent_string(string, depth=1):
    width = depth * INDENT_WIDTH_PX
    return '<table style="margin-left: {0}px;" border=0><tr><td>{1}</td></tr></table>'.format(width, string)


def mark_differences(value: str, compare_against: str):
    result = []
    for i, char in enumerate(value):
        try:
            if char != compare_against[i]:
                result.append('<font color="red">{}</font>'.format(char))
            else:
                result.append(char)
        except IndexError:
            result.append(char)
    return "".join(result)


def align_expected_and_got_value(expected: str, got: str, align_depth=1):
    width = align_depth * INDENT_WIDTH_PX
    got_marked = mark_differences(got, expected)
    return ('<table style="margin-left: {0}px;" border=0>'
            "<tr><td>Expected: </td><td>{1}</td></tr><tr><td>Got: </td><td>{2}</td> </tr>"
            "</table>".format(width, monospace(expected), monospace(got_marked)))


def convert_numbers_to_hex_string(arr):
    """[0, 1, 10, 2] -> "01a2" (util.py:310-318)."""
    lut = {i: "{0:x}".format(i) for i in range(16)}
    return "".join(lut[x] if x in lut else " {} ".format(x) for x in arr)


def minmax(arr):
    """(min, max) of a numeric array; (0, 0) for empty input
    (cythonext/util.pyx:20-36)."""
    import numpy as np

    arr = np.asarray(arr)
    if arr.size == 0:
        return 0, 0
    return arr.min(), arr.max()


def arr_to_number(inpt, reverse: bool = False, start: int = 0) -> int:
    """Bit array -> integer; MSB-first unless ``reverse``
    (cythonext/util.pyx:63-73)."""
    result = 0
    n = len(inpt)
    for i in range(start, n):
        if not reverse:
            if inpt[n - 1 - i + start]:
                result |= 1 << (i - start)
        else:
            if inpt[i]:
                result |= 1 << (i - start)
    return result
