"""Invertible bit-level decodings.

Counterpart of urh/signalprocessing/Encoding.py (973 LoC): a decoding is
a chain of invertible primitives applied in order when decoding and in
reverse order when encoding.  Primitives: invert, differential,
redundancy removal, carrier removal, CC1101 data whitening (LFSR x^5+1
keystream after sync-word search), LSB-first byte order, edge trigger,
substitution tables, external programs, cut, morse, and the EnOcean
Wireless Short Packet line code.

Primitives are host bit-ops (messages are short and ragged; the device
wins nothing here).
"""

from __future__ import annotations

import array
import copy
from xml.etree import ElementTree as ET

# Chain-name constants (settings.py:89-101 in the reference)
DECODING_NAMES = {
    "invert": "Invert",
    "differential": "Differential Encoding",
    "redundancy": "Remove Redundancy",
    "data_whitening": "Remove Data Whitening (CC1101)",
    "carrier": "Remove Carrier",
    "bitorder": "Change Bitorder",
    "edge": "Edge Trigger",
    "substitution": "Substitution",
    "external": "External Program",
    "enocean": "Wireless Short Packet (WSP)",
    "cut": "Cut before/after",
    "morse": "Morse Code",
}

DECODING_INVERT = DECODING_NAMES["invert"]
DECODING_DIFFERENTIAL = DECODING_NAMES["differential"]
DECODING_REDUNDANCY = DECODING_NAMES["redundancy"]
DECODING_DATAWHITENING = DECODING_NAMES["data_whitening"]
DECODING_CARRIER = DECODING_NAMES["carrier"]
DECODING_BITORDER = DECODING_NAMES["bitorder"]
DECODING_EDGE = DECODING_NAMES["edge"]
DECODING_SUBSTITUTION = DECODING_NAMES["substitution"]
DECODING_EXTERNAL = DECODING_NAMES["external"]
DECODING_ENOCEAN = DECODING_NAMES["enocean"]
DECODING_CUT = DECODING_NAMES["cut"]
DECODING_MORSE = DECODING_NAMES["morse"]


def str2bit(s: str) -> array.array:
    return array.array("B", map(int, s))


def bit2str(bits) -> str:
    return "".join(map(str, bits))


def hex2bit(hex_str: str) -> array.array:
    if not isinstance(hex_str, str):
        return array.array("B", [])
    if hex_str[:2] == "0x":
        hex_str = hex_str[2:]
    try:
        bitstring = "".join("{0:04b}".format(int(h, 16)) for h in hex_str)
        return array.array("B", [x == "1" for x in bitstring])
    except (TypeError, ValueError):
        return array.array("B", [])


def charstr2bit(s: str) -> array.array:
    return array.array("B", [c == "1" for c in s if c in "01"])


def run_command(command: str, param: str = "") -> str:
    """Shlex-aware external program invocation (handles quoted paths with
    spaces and extra arguments, util.py:400-470)."""
    from urh_tpu.util.misc import run_command as _run

    return _run(command, param=param if param else None)


class ErrorState:
    SUCCESS = "success"
    PREAMBLE_NOT_FOUND = "preamble not found"
    SYNC_NOT_FOUND = "sync not found"
    EOF_NOT_FOUND = "eof not found"
    WRONG_INPUT = "wrong input"
    MISSING_EXTERNAL_PROGRAM = "Please set external de/encoder program!"
    INVALID_CUTMARK = "cutmark is not valid"
    MISC = "general error"
    WRONG_PARAMETERS = "wrong parameters"


class Encoding:
    """A named, invertible chain of bit-level coding primitives."""

    ErrorState = ErrorState

    def __init__(self, chain=None):
        if chain is None:
            chain = []

        self.mode = 0
        self.external_decoder = ""
        self.external_encoder = ""
        self.multiple = 1
        self.src = []
        self.dst = []
        self.carrier = "1_"
        self.cutmark = array.array("B", [True, False])
        self.cutmode = 0  # 0 = before, 1 = after, 2 = before_pos, 3 = after_pos
        self.morse_low = 1
        self.morse_high = 3
        self.morse_wait = 1
        self._symbol_len = 1
        self.cc1101_overwrite_crc = False

        # CC1101 data whitening defaults: polynomial x^5+1, sync e9cae9ca
        self.data_whitening_polynomial = str2bit("00100001")
        self.data_whitening_sync = hex2bit("e9cae9ca")
        self.data_whitening_preamble = array.array("B", [True, False] * 16)
        self.lfsr_state = array.array("B", [])

        self.chain = []
        self.set_chain(chain)

    # -- chain management -----------------------------------------------
    _PARAM_OPS = {
        "redundancy": 2,
        "data_whitening": "0xe9cae9ca;0x21;0",
        "carrier": "1_",
        "substitution": "0:1;1:0;",
        "external": "./;./",
        "cut": "0;1010",
        "morse": "1;3;1",
    }

    def set_chain(self, names):
        if len(names) < 1:
            return
        self.chain = [names[0]]
        i = 1
        while i < len(names):
            matched = None
            for key, verbose in DECODING_NAMES.items():
                if verbose in names[i]:
                    matched = key
                    break
            if matched is not None:
                op = getattr(self, "code_" + matched)
                self.chain.append(op)
                if matched in self._PARAM_OPS:
                    i += 1
                    if i < len(names):
                        param = names[i]
                        if matched == "substitution":
                            param = self.get_subst_array(param)
                        self.chain.append(param)
                    else:
                        default = self._PARAM_OPS[matched]
                        if matched == "substitution":
                            default = self.get_subst_array(default)
                        self.chain.append(default)
            i += 1

    def get_chain(self):
        chainstr = [self.name]
        i = 1
        while i < len(self.chain):
            op = self.chain[i]
            for key, verbose in DECODING_NAMES.items():
                if op == getattr(self, "code_" + key):
                    chainstr.append(verbose)
                    if key in self._PARAM_OPS:
                        i += 1
                        param = self.chain[i]
                        if key == "substitution":
                            param = self.get_subst_string(param)
                        chainstr.append(param)
                    break
            i += 1
        return chainstr

    @property
    def name(self):
        return self.chain[0]

    @property
    def is_nrz(self) -> bool:
        return len(self.chain) <= 1

    @property
    def contains_cut(self) -> bool:
        return self.code_cut in self.chain

    @property
    def symbol_len(self):
        return int(self._symbol_len)

    def __str__(self):
        return self.name

    def __hash__(self):
        return hash(tuple(str(c) for c in self.get_chain()))

    def __eq__(self, other):
        if other is None:
            return False
        return self.get_chain() == other.get_chain()

    def get_subst_array(self, string):
        src, dst = [], []
        for item in string.split(";"):
            if len(item):
                try:
                    tsrc, tdst = item.split(":")
                    src.append(str2bit(tsrc))
                    dst.append(str2bit(tdst))
                except (ValueError, AttributeError):
                    pass
        return [src, dst]

    def get_subst_string(self, inpt):
        src, dst = inpt[0], inpt[1]
        output = ""
        if len(src) == len(dst):
            for i in range(len(src)):
                output += bit2str(src[i]) + ":" + bit2str(dst[i]) + ";"
        return output

    # -- chain driver (Encoding.py:259-382) ------------------------------
    def code(self, decoding: bool, inputbits):
        temp = array.array("B", inputbits)
        output = temp
        errors = 0
        error_states = []

        if decoding:
            i, ops, step = 0, len(self.chain), 1
        else:
            i, ops, step = len(self.chain) - 1, -1, -1

        while i != ops:
            operation = self.chain[i]
            while not callable(operation) and i + step != ops:
                i += step
                operation = self.chain[i]

            # ops with parameters configure instance state from chain[i+1]
            if operation == self.code_redundancy:
                self.multiple = int(self.chain[i + 1])
            elif operation == self.code_carrier:
                self.carrier = self.chain[i + 1]
            elif operation == self.code_substitution:
                self.src = self.chain[i + 1][0]
                self.dst = self.chain[i + 1][1]
            elif operation == self.code_externalprogram:
                if self.chain[i + 1] != "":
                    try:
                        self.external_decoder, self.external_encoder = self.chain[i + 1].split(";")
                    except ValueError:
                        pass
                else:
                    self.external_decoder, self.external_encoder = "", ""
            elif operation == self.code_data_whitening:
                self._configure_whitening(self.chain[i + 1])
            elif operation == self.code_cut:
                self._configure_cut(self.chain[i + 1])
            elif operation == self.code_morse:
                self._configure_morse(self.chain[i + 1])

            if callable(operation) and len(temp) > 0:
                output, temp_errors, state = operation(decoding, temp)
                errors += temp_errors
                if state != ErrorState.SUCCESS and state not in error_states:
                    error_states.append(state)

            i += step
            temp = output

        if len(inputbits):
            self._symbol_len = len(output) / len(inputbits)

        error_state = error_states[0] if error_states else ErrorState.SUCCESS
        return output, errors, error_state

    def encode(self, inpt):
        return self.code(False, inpt)[0]

    def decode(self, inpt):
        return self.code(True, inpt)[0]

    def applies_for_message(self, msg) -> bool:
        errors, state = self.analyze(msg)
        return errors == 0 and state == ErrorState.SUCCESS

    def analyze(self, inpt):
        return self.code(True, inpt)[1:3]

    def _configure_whitening(self, param: str):
        if param.count(";") == 2:
            sync, poly, overwrite_crc = param.split(";")
            if len(sync) > 0 and len(poly) > 0 and len(overwrite_crc) > 0:
                self.data_whitening_sync = hex2bit(sync)
                self.data_whitening_polynomial = hex2bit(poly)
                self.cc1101_overwrite_crc = overwrite_crc == "1"
        elif param.count(";") == 1:
            sync, poly = param.split(";")
            if len(sync) > 0 and len(poly) > 0:
                self.data_whitening_sync = hex2bit(sync)
                self.data_whitening_polynomial = hex2bit(poly)
                self.cc1101_overwrite_crc = False

    def _configure_cut(self, param: str):
        if param != "" and param.count(";") == 1:
            cutmode, tmp = param.split(";")
            self.cutmode = int(cutmode)
            if self.cutmode < 0 or self.cutmode > 3:
                self.cutmode = 0
            if self.cutmode in (0, 1):
                self.cutmark = str2bit(tmp)
                if len(self.cutmark) == 0:
                    self.cutmark = array.array("B", [True, False, True, False])
            else:
                try:
                    self.cutmark = int(tmp)
                except ValueError:
                    self.cutmark = 1

    def _configure_morse(self, param: str):
        if param != "" and param.count(";") == 2:
            try:
                l, h, w = param.split(";")
                self.morse_low, self.morse_high, self.morse_wait = int(l), int(h), int(w)
            except ValueError:
                self.morse_low, self.morse_high, self.morse_wait = 1, 3, 1

    # -- primitives ------------------------------------------------------
    def code_invert(self, decoding, inpt):
        return array.array("B", [not x for x in inpt]), 0, ErrorState.SUCCESS

    def code_differential(self, decoding, inpt):
        output = array.array("B", [inpt[0]])
        if decoding:
            for i in range(1, len(inpt)):
                output.append(inpt[i] != inpt[i - 1])
        else:
            for i in range(1, len(inpt)):
                if not inpt[i]:
                    output.append(output[i - 1])
                else:
                    output.append(not output[i - 1])
        return output, 0, ErrorState.SUCCESS

    def code_redundancy(self, decoding, inpt):
        output = array.array("B", [])
        errors = 0
        if len(inpt) and self.multiple > 1:
            if decoding:
                count = 0
                what = -1
                for i in inpt:
                    if i:
                        if not what:
                            if count > 0:
                                errors += 1
                            count = 0
                        what = True
                        count += 1
                        if count >= self.multiple:
                            output.append(True)
                            count = 0
                    else:
                        if what:
                            if count > 0:
                                errors += 1
                            count = 0
                        what = False
                        count += 1
                        if count >= self.multiple:
                            output.append(False)
                            count = 0
            else:
                for i in inpt:
                    output.extend([i] * self.multiple)
        return output, errors, ErrorState.SUCCESS

    def code_carrier(self, decoding, inpt):
        output = array.array("B", [])
        errors = 0
        if decoding:
            if len(self.carrier) > 0:
                for x in range(len(inpt)):
                    tmp = self.carrier[x % len(self.carrier)]
                    if tmp not in ("0", "1", "*"):  # data position
                        output.append(inpt[x])
                    elif tmp in ("0", "1"):
                        if (inpt[x] and tmp != "1") or (not inpt[x] and tmp != "0"):
                            errors += 1
        else:
            if len(self.carrier) > 0:
                x = 0
                for bit in inpt:
                    while self.carrier[x % len(self.carrier)] in ("0", "1", "*"):
                        output.append(self.carrier[x % len(self.carrier)] == "1")
                        x += 1
                    output.append(bit)
                    x += 1
                # consume trailing carrier pattern without wrap-around
                while x % len(self.carrier) > 0 and self.carrier[x % len(self.carrier)] in ("0", "1", "*"):
                    output.append(self.carrier[x % len(self.carrier)] == "1")
                    x += 1
        return output, errors, ErrorState.SUCCESS

    def code_lsb_first(self, decoding, inpt):
        output = array.array("B", inpt)
        errors = len(inpt) % 8
        for i in range(0, len(output) - 7, 8):
            output[i : i + 8] = output[i : i + 8][::-1]
        return output, errors, ErrorState.SUCCESS

    # alias matching the chain-name key "bitorder"
    code_bitorder = code_lsb_first

    def code_edge(self, decoding, inpt):
        errors = 0
        output = array.array("B", [])
        if decoding:
            i = 1
            while i < len(inpt):
                if inpt[i] == inpt[i - 1]:
                    errors += 1
                    i += 1
                    continue
                output.append(inpt[i])
                i += 2
        else:
            for i in inpt:
                output.extend([False, True] if i else [True, False])
        return output, errors, ErrorState.SUCCESS

    def code_substitution(self, decoding, inpt):
        padded_inpt = copy.copy(inpt)
        output = array.array("B", [])
        src, dst = self.src, self.dst
        if len(src) < 1 or len(dst) < 1:
            return [], 1, ErrorState.WRONG_INPUT
        if not decoding:
            src, dst = dst, src

        item_size = len(src[0])
        zero_padding = (item_size - (len(padded_inpt) % item_size)) % item_size
        padded_inpt.extend([False] * zero_padding)
        errors = zero_padding

        i = 0
        try:
            while i < len(padded_inpt):
                cnt = src.count(padded_inpt[i : i + item_size])
                if cnt == 1:
                    output.extend(dst[src.index(padded_inpt[i : i + item_size])])
                elif cnt < 1:
                    output.extend(padded_inpt[i : i + 1])
                    i += 1
                    errors += 1
                    continue
                i += item_size
        except IndexError:
            return [], 42, ErrorState.WRONG_INPUT
        return output, errors, ErrorState.SUCCESS

    def code_externalprogram(self, decoding, inpt):
        if decoding and self.external_decoder != "":
            output = charstr2bit(run_command(self.external_decoder, bit2str(inpt)))
        elif not decoding and self.external_encoder != "":
            output = charstr2bit(run_command(self.external_encoder, bit2str(inpt)))
        else:
            return [], 1, ErrorState.MISSING_EXTERNAL_PROGRAM
        return output, 0, ErrorState.SUCCESS

    code_external = code_externalprogram

    def code_cut(self, decoding, inpt):
        errors = 0
        state = ErrorState.SUCCESS
        output = array.array("B", [])
        pos = -1
        if decoding:
            if self.cutmode in (0, 1):
                len_cutmark = len(self.cutmark)
                if len_cutmark < 1:
                    return inpt, 0, ErrorState.INVALID_CUTMARK
                for i in range(len(inpt) - len_cutmark):
                    if all(inpt[i + j] == self.cutmark[j] for j in range(len_cutmark)):
                        pos = i
                        break
            else:
                pos = int(self.cutmark)

            if 0 <= pos < len(inpt):
                if self.cutmode in (0, 2):
                    output.extend(inpt[pos:])  # delete before
                else:
                    pos += len(self.cutmark) if self.cutmode == 1 else 1
                    output.extend(inpt[:pos])  # delete after
            else:
                state = ErrorState.PREAMBLE_NOT_FOUND
                output.extend(inpt)
        else:
            # cutting is lossy; encoding passes through
            output.extend(inpt)
        return output, errors, state

    def code_morse(self, decoding, inpt):
        errors = 0
        output = array.array("B", [])
        if self.morse_low >= self.morse_high:
            return inpt, 1, ErrorState.WRONG_PARAMETERS

        if decoding:
            cnt = 0
            for i in range(len(inpt)):
                if inpt[i] and i < len(inpt) - 1:
                    cnt += 1
                else:
                    if i == len(inpt) - 1 and inpt[-1]:
                        cnt += 1
                    if cnt >= self.morse_high:
                        output.append(True)
                    elif 0 < cnt <= self.morse_low:
                        output.append(False)
                    elif cnt > 0:
                        output.append(cnt > (self.morse_high + self.morse_low // 2))
                        errors += 1
                    cnt = 0
        else:
            for bit in inpt:
                output.extend([False] * self.morse_wait)
                output.extend([True] * (self.morse_high if bit else self.morse_low))
            output.extend([False] * self.morse_wait)
        return output, errors, ErrorState.SUCCESS

    # -- CC1101 data whitening (Encoding.py:384-472) ---------------------
    def lfsr(self, clock):
        poly = array.array("B", [False])
        poly.extend(self.data_whitening_polynomial)
        len_pol = len(poly)

        if len(self.lfsr_state) == 0:
            self.lfsr_state.extend([True] * len_pol)
        for _ in range(clock):
            first_bit = False
            for j in range(len_pol):
                if poly[j] and self.lfsr_state[j]:
                    first_bit = not first_bit
            for j in range(len_pol - 1, 0, -1):
                self.lfsr_state[j] = self.lfsr_state[j - 1]
            self.lfsr_state[0] = first_bit
        return self.lfsr_state[1:len_pol]

    def apply_data_whitening(self, decoding, inpt):
        len_sync = len(self.data_whitening_sync)
        len_polynomial = len(self.data_whitening_polynomial)
        inpt_from = 0
        inpt_to = len(inpt)

        # crop duplicated last bit when decoding
        if decoding and inpt_to > 1 and inpt[-1] == inpt[-2]:
            inpt_to -= 1

        if inpt_to < 1 or len_polynomial < 1 or len_sync < 1:
            return inpt[inpt_from:inpt_to], 0, ErrorState.MISC

        # find whitening start (right after sync word)
        whitening_start_pos = inpt_from
        sync = self.data_whitening_sync
        for i in range(inpt_from, inpt_to - len_sync):
            if all(inpt[i + j] == sync[j] for j in range(len_sync)):
                whitening_start_pos = i + len_sync
                break
        if decoding and whitening_start_pos == inpt_from:
            return inpt[inpt_from:inpt_to], 0, ErrorState.SYNC_NOT_FOUND

        # keystream
        self.lfsr_state = array.array("B", [])
        keystream = self.lfsr(0)
        for _ in range(whitening_start_pos, inpt_to, 8):
            keystream.extend(self.lfsr(8))
        if len(keystream) < inpt_to - whitening_start_pos:
            return inpt[inpt_from:inpt_to], 0, ErrorState.MISC

        if not decoding and self.cc1101_overwrite_crc:
            from urh_tpu.coding.crc import GenericCRC

            offset = inpt_to % 8
            data_end = inpt_to - 16 - offset
            c = GenericCRC(polynomial="16_standard", start_value=True)
            crc = c.crc(inpt[whitening_start_pos:data_end])
            for i in range(16):
                inpt[data_end + i] = crc[i]

        for i in range(whitening_start_pos, inpt_to):
            inpt[i] ^= keystream[i - whitening_start_pos]

        # duplicate last bit when encoding
        if not decoding:
            inpt += array.array("B", [inpt[-1]])
            inpt_to += 1

        return inpt[inpt_from:inpt_to], 0, ErrorState.SUCCESS

    def code_data_whitening(self, decoding, inpt):
        return self.apply_data_whitening(decoding, array.array("B", inpt))

    # -- EnOcean WSP line code (Encoding.py:794-898) ---------------------
    def code_enocean(self, decoding, inpt):
        errors = 0
        output = array.array("B", [])
        preamble = str2bit("10101010")
        sof = str2bit("1001")
        eof = str2bit("1011")

        if decoding:
            inpt, _, _ = self.code_invert(True, inpt)
            # the first (inverted) 1 of EnOcean is weak and often drowns in
            # noise: ensure the protocol starts with 1
            inpt.insert(0, True)
            # zero-noise signals (fuzzer output) swallow the last two zeros
            inpt.extend([True, True])

        try:
            n = inpt.index(False) - 1
        except ValueError:
            return inpt, 0, ErrorState.PREAMBLE_NOT_FOUND

        if inpt[n : n + 8] != preamble:
            return inpt, 0, ErrorState.PREAMBLE_NOT_FOUND
        if inpt[n + 8 : n + 12] != sof:
            return inpt, 0, ErrorState.SYNC_NOT_FOUND
        output.extend(inpt[n : n + 12])

        start = n + 12
        n = len(inpt)
        while n > start and inpt[n - 4 : n] != eof:
            n -= 1
        end = n - 4

        state = ErrorState.SUCCESS
        if decoding:
            try:
                for n in range(start, end, 12):
                    errors += sum([inpt[n + 2] == inpt[n + 3], inpt[n + 6] == inpt[n + 7]])
                    errors += (
                        sum([inpt[n + 10] != False, inpt[n + 11] != True])
                        if n < end - 11
                        else 0
                    )
                    output.extend(
                        [inpt[n], inpt[n + 1], inpt[n + 2], inpt[n + 4],
                         inpt[n + 5], inpt[n + 6], inpt[n + 8], inpt[n + 9]]
                    )
            except IndexError:
                return inpt, 0, ErrorState.MISC
            output.extend(inpt[end : end + 4])
        else:
            for n in range(start, end, 8):
                try:
                    output.extend(
                        [inpt[n], inpt[n + 1], inpt[n + 2], not inpt[n + 2],
                         inpt[n + 3], inpt[n + 4], inpt[n + 5], not inpt[n + 5],
                         inpt[n + 6], inpt[n + 7]]
                    )
                except IndexError:
                    output.extend([False, True])
                    break
                if n < len(inpt) - 15:
                    output.extend([False, True])
            output.extend(eof)
            output.append(True)
            output, _, _ = self.code_invert(True, output)

        return output, errors, state

    # -- persistence -----------------------------------------------------
    @staticmethod
    def decodings_to_xml_tag(decodings: list) -> ET.Element:
        decodings_tag = ET.Element("decodings")
        for decoding in decodings:
            dec_str = ""
            for chn in decoding.get_chain():
                dec_str += repr(chn) + ", "
            dec_tag = ET.SubElement(decodings_tag, "decoding")
            dec_tag.text = dec_str
        return decodings_tag

    @staticmethod
    def read_decoders_from_xml_tag(xml_tag: ET.Element):
        if xml_tag is None:
            return []
        if xml_tag.tag != "decodings":
            xml_tag = xml_tag.find("decodings")
        if xml_tag is None:
            return []
        decoders = []
        for decoding_tag in xml_tag.findall("decoding"):
            conf = [d.strip().replace("'", "") for d in decoding_tag.text.split(",")]
            decoders.append(Encoding(conf))
        return decoders
