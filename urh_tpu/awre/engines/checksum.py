"""Checksum inference engine (urh/awre/engines/ChecksumEngine.py):
per length cluster, search for WSP checksums and standard CRC
configurations with their covered data range, then keep the dominant
CRC across clusters.
"""

from __future__ import annotations

import copy
import math
from collections import defaultdict

from urh_tpu.awre import kernels as awre_kernels
from urh_tpu.awre.common_range import ChecksumRange
from urh_tpu.awre.engines.engine import Engine
from urh_tpu.coding.crc import GenericCRC
from urh_tpu.coding.wsp import WSPChecksum


class ChecksumEngine(Engine):
    def __init__(self, bitvectors, n_gram_length=8, minimum_score=0.9,
                 already_labeled: list = None):
        self.bitvectors = bitvectors
        self.n_gram_length = n_gram_length
        self.minimum_score = minimum_score
        if already_labeled is None:
            self.already_labeled_cols = set()
        else:
            self.already_labeled_cols = {e for rng in already_labeled for e in range(*rng)}

    def find(self):
        result = list()
        bitvectors_by_n_gram_length = defaultdict(list)
        for i, bitvector in enumerate(self.bitvectors):
            bin_num = int(math.ceil(len(bitvector) / self.n_gram_length))
            bitvectors_by_n_gram_length[bin_num].append(i)

        crc = GenericCRC()
        for length, message_indices in bitvectors_by_n_gram_length.items():
            checksums_for_length = []
            for index in message_indices:
                bits = self.bitvectors[index]
                import array as _array

                arr_bits = _array.array("B", bits)
                data_start, data_stop, crc_start, crc_stop = WSPChecksum.search_for_wsp_checksum(arr_bits)
                if (data_start, data_stop, crc_start, crc_stop) != (0, 0, 0, 0):
                    checksum_range = ChecksumRange(
                        start=crc_start, length=crc_stop - crc_start,
                        data_range_start=data_start, data_range_end=data_stop,
                        crc=WSPChecksum(), score=1 / len(message_indices),
                        field_type="checksum", message_indices={index})
                    try:
                        present = next(c for c in checksums_for_length if c == checksum_range)
                        present.message_indices.add(index)
                    except StopIteration:
                        checksums_for_length.append(checksum_range)
                    continue

                crc_object, data_start, data_stop, crc_start, crc_stop = crc.guess_all(
                    arr_bits, ignore_positions=self.already_labeled_cols)

                if (crc_object, data_start, data_stop, crc_start, crc_stop) != (0, 0, 0, 0, 0):
                    checksum_range = ChecksumRange(
                        start=crc_start, length=crc_stop - crc_start,
                        data_range_start=data_start, data_range_end=data_stop,
                        crc=copy.copy(crc_object), score=1 / len(message_indices),
                        field_type="checksum", message_indices={index})
                    try:
                        present = next(rng for rng in checksums_for_length if rng == checksum_range)
                        present.message_indices.add(index)
                        continue
                    except StopIteration:
                        pass
                    checksums_for_length.append(checksum_range)

                    matching = awre_kernels.check_crc_for_messages(
                        message_indices, self.bitvectors, data_start, data_stop,
                        crc_start, crc_stop, *crc_object.get_parameters())
                    checksum_range.message_indices.update(matching)

            for rng in checksums_for_length:
                rng.score = len(rng.message_indices) / len(message_indices)

            try:
                result.append(max(checksums_for_length, key=lambda x: x.score))
            except ValueError:
                pass  # no checksums found for this length

        try:
            max_scored = max(
                filter(lambda x: len(x.message_indices) >= 2 and x.score >= self.minimum_score,
                       result),
                key=lambda x: x.score)
        except ValueError:
            return []

        return list(filter(lambda x: x.crc == max_scored.crc, result))
