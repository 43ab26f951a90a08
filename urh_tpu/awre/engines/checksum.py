"""Checksum-field inference.

Behavioral contract: urh/awre/engines/ChecksumEngine.py — per
message-length cluster, find a (data range, checksum range, CRC config)
hypothesis per message (EnOcean WSP first, then the standard-CRC
search), pool identical hypotheses, extend each over the whole cluster
with the batched GF(2) CRC check, and keep only hypotheses using the
cluster-dominant CRC.
"""

from __future__ import annotations

import array
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
        spans = already_labeled or []
        self.already_labeled_cols = {pos for lo, hi in spans
                                     for pos in range(lo, hi)}

    def find(self):
        clusters = defaultdict(list)
        for i, bv in enumerate(self.bitvectors):
            clusters[int(math.ceil(len(bv) / self.n_gram_length))].append(i)

        cluster_best = []
        searcher = GenericCRC()
        for gram_count, members in clusters.items():
            hypotheses = []
            for index in members:
                hyp = self._hypothesis_for(index, searcher, len(members))
                if hyp is None:
                    continue
                pooled = next((h for h in hypotheses if h == hyp), None)
                if pooled is not None:
                    pooled.message_indices.add(index)
                    continue
                hypotheses.append(hyp)
                if not isinstance(hyp.crc, WSPChecksum):
                    # one GF(2) matmul extends the hypothesis cluster-wide
                    hyp.message_indices.update(awre_kernels.check_crc_for_messages(
                        members, self.bitvectors,
                        hyp.data_range_start, hyp.data_range_end,
                        hyp.start, hyp.start + hyp.length,
                        *hyp.crc.get_parameters()))

            for hyp in hypotheses:
                hyp.score = len(hyp.message_indices) / len(members)
            if hypotheses:
                cluster_best.append(max(hypotheses, key=lambda h: h.score))

        dominant = [h for h in cluster_best
                    if len(h.message_indices) >= 2 and h.score >= self.minimum_score]
        if not dominant:
            return []
        anchor = max(dominant, key=lambda h: h.score)
        return [h for h in cluster_best if h.crc == anchor.crc]

    def _hypothesis_for(self, index: int, searcher: GenericCRC,
                        cluster_size: int):
        """One message's (data range, crc range, config) candidate, WSP
        preferred over generic CRCs."""
        bits = array.array("B", self.bitvectors[index])

        wsp_spans = WSPChecksum.search_for_wsp_checksum(bits)
        if wsp_spans != (0, 0, 0, 0):
            data_lo, data_hi, crc_lo, crc_hi = wsp_spans
            return ChecksumRange(
                start=crc_lo, length=crc_hi - crc_lo,
                data_range_start=data_lo, data_range_end=data_hi,
                crc=WSPChecksum(), score=1 / cluster_size,
                field_type="checksum", message_indices={index})

        found = searcher.guess_all(bits, ignore_positions=self.already_labeled_cols)
        if found == (0, 0, 0, 0, 0):
            return None
        config, data_lo, data_hi, crc_lo, crc_hi = found
        return ChecksumRange(
            start=crc_lo, length=crc_hi - crc_lo,
            data_range_start=data_lo, data_range_end=data_hi,
            crc=copy.copy(config), score=1 / cluster_size,
            field_type="checksum", message_indices={index})
