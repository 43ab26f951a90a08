"""AWRE accuracy-vs-broken-messages experiment harness.

Port of the reference research harness concept
(tests/awre/AWRExperiments.py:27-65, 327-447): generate labeled
protocols, corrupt the tail of the first K messages, run FormatFinder
with no prior knowledge, and score how many expected labels the
inference recovered.  Accuracy of a message = |inferred ∩ expected| /
|expected| over its labels (AWRExperiments.calculate_accuracy), reported
both over all messages and with the broken ones excluded.

Usage:  python tools/awre_accuracy.py [--quick]
Writes AWRE_ACCURACY.json at the repo root; tests/test_awre_accuracy.py
asserts coarse floors on the same curves in CI.
"""

from __future__ import annotations

import json
import os
import random
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.message_type_builder import MessageTypeBuilder
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.coding.crc import GenericCRC
from urh_tpu.protocol.labels import FieldType, MessageType, Participant

_F = FieldType.Function


def _protocol_basic() -> ProtocolGenerator:
    """8-bit preamble / 16-bit sync / length / two 16-bit addresses /
    seqnum (shape of AWRExperiments._prepare_protocol_1)."""
    alice = Participant("Alice", address_hex="dead")
    bob = Participant("Bob", address_hex="beef")
    mb = MessageTypeBuilder("data")
    mb.add_label(_F.PREAMBLE, 8)
    mb.add_label(_F.SYNC, 16)
    mb.add_label(_F.LENGTH, 8)
    mb.add_label(_F.SRC_ADDRESS, 16)
    mb.add_label(_F.DST_ADDRESS, 16)
    mb.add_label(_F.SEQUENCE_NUMBER, 8)
    return ProtocolGenerator([mb.message_type],
                             syncs_by_mt={mb.message_type: "0x1337"},
                             participants=[alice, bob])


def _protocol_long_preamble() -> ProtocolGenerator:
    """72-bit preamble, 24-bit addresses, 16-bit seqnum with increment 32
    (shape of _prepare_protocol_2)."""
    alice = Participant("Alice", address_hex="dead01")
    bob = Participant("Bob", address_hex="beef24")
    mb = MessageTypeBuilder("data")
    mb.add_label(_F.PREAMBLE, 72)
    mb.add_label(_F.SYNC, 16)
    mb.add_label(_F.LENGTH, 8)
    mb.add_label(_F.SRC_ADDRESS, 24)
    mb.add_label(_F.DST_ADDRESS, 24)
    mb.add_label(_F.SEQUENCE_NUMBER, 16)
    return ProtocolGenerator([mb.message_type],
                             syncs_by_mt={mb.message_type: "0x1337"},
                             preambles_by_mt={mb.message_type: "10" * 36},
                             sequence_number_increment=32,
                             participants=[alice, bob])


def _protocol_checksum() -> ProtocolGenerator:
    """Data + ack message types with a CRC8 CCITT checksum field (shape
    of _prepare_protocol_3)."""
    alice = Participant("Alice", address_hex="1337")
    bob = Participant("Bob", address_hex="beef")
    checksum = GenericCRC.from_standard_checksum("CRC8 CCITT")

    mb = MessageTypeBuilder("data")
    mb.add_label(_F.PREAMBLE, 8)
    mb.add_label(_F.SYNC, 16)
    mb.add_label(_F.LENGTH, 8)
    mb.add_label(_F.SRC_ADDRESS, 16)
    mb.add_label(_F.DST_ADDRESS, 16)
    mb.add_label(_F.SEQUENCE_NUMBER, 8)
    mb.add_label(_F.DATA, 10 * 8)
    mb.add_checksum_label(8, checksum)

    mb_ack = MessageTypeBuilder("ack")
    mb_ack.add_label(_F.PREAMBLE, 8)
    mb_ack.add_label(_F.SYNC, 16)
    mb_ack.add_label(_F.LENGTH, 8)
    mb_ack.add_label(_F.DST_ADDRESS, 16)
    mb_ack.add_checksum_label(8, checksum)

    return ProtocolGenerator(
        [mb.message_type, mb_ack.message_type],
        syncs_by_mt={mb.message_type: "0x9a7d", mb_ack.message_type: "0x9a7d"},
        participants=[alice, bob])


PROTOCOLS = {
    "basic": _protocol_basic,
    "long_preamble": _protocol_long_preamble,
    "checksum_ack": _protocol_checksum,
}


def generate(name: str, num_messages: int, num_broken: int, rng_seed: int):
    """-> (messages, expected label lists); first num_broken messages get
    their tail randomized from a random split point on (the reference's
    corruption model, AWRExperiments.py:393-398)."""
    random.seed(rng_seed)
    np.random.seed(rng_seed)
    pg = PROTOCOLS[name]()

    data_mts = [mt for mt in pg.message_types
                if mt.get_first_label_with_type(_F.DATA)]
    i = -1
    while len(pg.messages) < num_messages:
        i += 1
        source = pg.participants[i % len(pg.participants)]
        destination = pg.participants[(i + 1) % len(pg.participants)]
        data_bytes = 8 if i % 2 == 0 else 64
        if not data_mts:
            data = "".join(random.choice("01") for _ in range(data_bytes * 8))
            pg.generate_message(data=data, source=source,
                                destination=destination)
        else:
            mt = data_mts[i % len(data_mts)]
            width = mt.get_first_label_with_type(_F.DATA).length
            data = "".join(random.choice("01") for _ in range(width))
            pg.generate_message(message_type=mt, data=data, source=source,
                                destination=destination)
        ack = next((mt for mt in pg.message_types if "ack" in mt.name), None)
        if ack is not None:
            pg.generate_message(message_type=ack, data="", source=destination,
                                destination=source)

    messages = pg.messages[:num_messages]
    for k in range(num_broken):
        msg = messages[k]
        pos = random.randint(0, len(msg.plain_bits) // 2)
        tail = [random.randint(0, 1) for _ in range(len(msg.plain_bits) - pos)]
        msg.plain_bits[pos:] = tail

    expected = [msg.message_type for msg in messages]
    empty = MessageType("empty")
    for msg in messages:  # no prior knowledge
        msg.message_type = empty
    for mt in expected:  # data content is not an inference target
        data_lbl = mt.get_first_label_with_type(_F.DATA)
        if data_lbl is not None:
            mt.remove(data_lbl)
    return messages, expected


def run_format_finder(messages):
    ff = FormatFinder(messages)
    ff.known_participant_addresses.clear()
    ff.run()
    for msg_type, indices in ff.existing_message_types.items():
        for i in indices:
            messages[i].message_type = msg_type


def calculate_accuracy(messages, expected, skip_first: int = 0) -> float:
    """Percentage of expected labels recovered, averaged over messages
    (AWRExperiments.calculate_accuracy)."""
    scored = range(skip_first, len(messages))
    if not len(scored):
        return 0.0
    total = sum(
        len(set(expected[i]) & set(messages[i].message_type))
        / len(expected[i])
        for i in scored)
    return total / len(scored) * 100.0


def accuracy_curve(name: str, num_messages: int, broken_counts, runs: int):
    curve = []
    for broken in broken_counts:
        accs, accs_wo = [], []
        for r in range(runs):
            messages, expected = generate(name, num_messages, broken,
                                          rng_seed=r)
            run_format_finder(messages)
            accs.append(calculate_accuracy(messages, expected))
            accs_wo.append(calculate_accuracy(messages, expected,
                                              skip_first=broken))
        curve.append({
            "broken": broken,
            "accuracy": round(float(np.mean(accs)), 1),
            "accuracy_std": round(float(np.std(accs)), 1),
            "accuracy_sem": round(float(np.std(accs))
                                  / max(1, len(accs)) ** 0.5, 2),
            "accuracy_without_broken": round(float(np.mean(accs_wo)), 1),
            "accuracy_without_broken_std":
                round(float(np.std(accs_wo)), 1),
        })
    return curve


def broken_counts_for(num_messages: int):
    """Fractions of the message count: 0, 1/8, 1/4, 3/8, 1/2 — the
    reference experiments sweep 'broken messages' proportionally
    (AWRExperiments.py:27-45)."""
    return [int(num_messages * f / 8) for f in (0, 1, 2, 3, 4)]


def main():
    quick = "--quick" in sys.argv
    message_counts = [16] if quick else [16, 64, 256]
    runs = 2 if quick else 10

    results = {}
    for name in PROTOCOLS:
        results[name] = {}
        for num_messages in message_counts:
            broken_counts = (broken_counts_for(num_messages)[:3]
                             if quick else broken_counts_for(num_messages))
            curve = accuracy_curve(name, num_messages, broken_counts, runs)
            results[name][str(num_messages)] = curve
            print(name, num_messages, curve, flush=True)

    out = {"message_counts": message_counts, "runs": runs,
           "broken_fractions": [0, 0.125, 0.25, 0.375, 0.5],
           "curves": results}
    with open(os.path.join(_REPO, "AWRE_ACCURACY.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
