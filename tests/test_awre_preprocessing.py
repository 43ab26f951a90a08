"""Port of reference tests/awre/test_awre_preprocessing.py: preamble/sync
word discovery from raw bitvectors."""

import random

import numpy as np

from urh_tpu.awre.format_finder import FormatFinder
from urh_tpu.awre.message_type_builder import MessageTypeBuilder
from urh_tpu.awre.preprocessor import Preprocessor
from urh_tpu.awre.protocol_generator import ProtocolGenerator
from urh_tpu.protocol.labels import FieldType, Participant
from urh_tpu.protocol.message import Message


def build_protocol_generator(preamble_syncs: list, num_messages: tuple,
                             data: tuple) -> ProtocolGenerator:
    message_types, preambles_by_mt, syncs_by_mt = [], {}, {}
    assert len(preamble_syncs) == len(num_messages) == len(data)
    for i, (preamble, sync_word) in enumerate(preamble_syncs):
        preamble, sync_word = map(ProtocolGenerator.to_bits, (preamble, sync_word))
        mb = MessageTypeBuilder(f"message type #{i}")
        mb.add_label(FieldType.Function.PREAMBLE, len(preamble))
        mb.add_label(FieldType.Function.SYNC, len(sync_word))
        message_types.append(mb.message_type)
        preambles_by_mt[mb.message_type] = preamble
        syncs_by_mt[mb.message_type] = sync_word

    pg = ProtocolGenerator(message_types, preambles_by_mt=preambles_by_mt,
                           syncs_by_mt=syncs_by_mt)
    for i, msg_type in enumerate(pg.message_types):
        for j in range(num_messages[i]):
            msg_data = (pg.decimal_to_bits(data[i](j), num_bits=8)
                        if callable(data[i]) else data[i])
            pg.generate_message(message_type=msg_type, data=msg_data)
    return pg


def _bitvectors(pg):
    return [np.array(msg.plain_bits, dtype=np.uint8) for msg in pg.protocol.messages]


def test_very_simple_sync_word_finding():
    pg = build_protocol_generator([("10101010", "1101")], (20,), (lambda i: 10 * i,))
    preprocessor = Preprocessor(_bitvectors(pg))
    possible_syncs = preprocessor.find_possible_syncs()
    assert len(possible_syncs) >= 1
    assert possible_syncs[0] == "1101"


def test_simple_sync_word_finding():
    pg = build_protocol_generator(
        [("10101010", "1001"), ("101010101010", "1001")], (20, 5),
        (lambda i: 10 * i, lambda i: 22 * i))
    preprocessor = Preprocessor(_bitvectors(pg))
    possible_syncs = preprocessor.find_possible_syncs()
    assert len(possible_syncs) >= 1
    assert possible_syncs[0] == "1001"


def test_sync_word_finding_odd_preamble():
    preamble, sync = "0101010", "1101"
    pg = build_protocol_generator(
        [(preamble, sync), (preamble + "10", sync)], (20, 5),
        (lambda i: 10 * i, lambda i: i))
    preprocessor = Preprocessor(_bitvectors(pg))
    possible_syncs = preprocessor.find_possible_syncs()
    # with an odd preamble length the last preamble bit counts to the sync
    assert possible_syncs[0] == preamble[-1] + sync[:-1]


def test_sync_word_finding_special_preamble():
    preamble, sync = "111001110011100", "0110"
    pg = build_protocol_generator(
        [(preamble, sync), (preamble + "10", sync)], (20, 5),
        (lambda i: 10 * i, lambda i: i))
    preprocessor = Preprocessor(_bitvectors(pg))
    possible_syncs = preprocessor.find_possible_syncs()
    assert sync == possible_syncs[0]


def test_sync_word_finding_errored_preamble():
    preamble, sync = "00010101010", "0110"  # first bits of preamble broken
    pg = build_protocol_generator(
        [(preamble, sync), (preamble + "10", sync)], (20, 5),
        (lambda i: 10 * i, lambda i: i))
    preprocessor = Preprocessor(_bitvectors(pg))
    possible_syncs = preprocessor.find_possible_syncs()
    assert preamble[-1] + sync[:-1] in possible_syncs


def test_sync_word_finding_with_two_sync_words():
    pg = build_protocol_generator(
        [("0xaaaa", "0x1234"), ("0xaaaa", "0xcafe")], (15, 10),
        (lambda i: 12 * i, lambda i: 16 * i))
    preprocessor = Preprocessor(_bitvectors(pg))
    possible_syncs = preprocessor.find_possible_syncs()
    assert len(possible_syncs) >= 2
    assert ProtocolGenerator.to_bits("0x1234") in possible_syncs
    assert ProtocolGenerator.to_bits("0xcafe") in possible_syncs


def test_multiple_sync_words():
    """Every non-0xa? byte must be detected as the sync byte — exhaustive
    sweep over sync values (reference test_multiple_sync_words)."""
    hex_messages = ["aaS1234", "aaScafe", "aaSdead", "aaSbeef"]
    for i in range(1, 256):
        sync = "{0:02x}".format(i)
        if sync.startswith("a"):
            continue
        messages = [Message.from_plain_hex_str(m.replace("S", sync))
                    for m in hex_messages]
        for k in range(1, len(messages)):
            messages[k].message_type = messages[0].message_type

        ff = FormatFinder(messages)
        ff.run()
        assert len(ff.message_types) == 1, sync

        preamble = ff.message_types[0].get_first_label_with_type(
            FieldType.Function.PREAMBLE)
        assert preamble.start == 0, sync
        assert preamble.length == 8, sync
        sync_lbl = ff.message_types[0].get_first_label_with_type(
            FieldType.Function.SYNC)
        assert sync_lbl.start == 8, sync
        assert sync_lbl.length == 8, sync


def test_sync_word_finding_varying_message_length():
    hex_messages = [
        "aaaa9a7d0f1337471100009a44ebdd13517bf9",
        "aaaa9a7d4747111337000134a4473c002b909630b11df37e34728c79c60396176aff2b"
        "5384e82f31511581d0cbb4822ad1b6734e2372ad5cf4af4c9d6b067e5f7ec359ec443c"
        "3b5ddc7a9e",
        "aaaa9a7d0f13374711000205ee081d26c86b8c",
        "aaaa9a7d474711133700037cae4cda789885f88f5fb29adc9acf954cb2850b9d94e7f3"
        "b009347c466790e89f2bcd728987d4670690861bbaa120f71f14d4ef8dc738a6d7c30e"
        "7d2143c267",
        "aaaa9a7d0f133747110004c2906142300427f3",
    ]
    messages = [Message.from_plain_hex_str(h) for h in hex_messages]
    for i in range(1, len(messages)):
        messages[i].message_type = messages[0].message_type

    ff = FormatFinder(messages)
    ff.run()
    assert len(ff.message_types) == 1
    preamble = ff.message_types[0].get_first_label_with_type(
        FieldType.Function.PREAMBLE)
    assert preamble.start == 0
    assert preamble.length == 16
    sync = ff.message_types[0].get_first_label_with_type(FieldType.Function.SYNC)
    assert sync.start == 16
    assert sync.length == 16


def test_sync_word_finding_common_prefix():
    """Odd/even messages are very similar but there is only ONE sync word:
    the preprocessor must collapse to the common prefix."""
    sync = "0x1337"
    num_messages = 10
    alice = Participant("Alice", address_hex="dead01")
    bob = Participant("Bob", address_hex="beef24")

    mb = MessageTypeBuilder("protocol_with_one_message_type")
    mb.add_label(FieldType.Function.PREAMBLE, 72)
    mb.add_label(FieldType.Function.SYNC, 16)
    mb.add_label(FieldType.Function.LENGTH, 8)
    mb.add_label(FieldType.Function.SRC_ADDRESS, 24)
    mb.add_label(FieldType.Function.DST_ADDRESS, 24)
    mb.add_label(FieldType.Function.SEQUENCE_NUMBER, 16)

    pg = ProtocolGenerator([mb.message_type],
                           syncs_by_mt={mb.message_type: sync},
                           preambles_by_mt={mb.message_type: "10" * 36},
                           participants=[alice, bob])
    random.seed(0)
    for i in range(num_messages):
        if i % 2 == 0:
            source, destination, data_length = alice, bob, 8
        else:
            source, destination, data_length = bob, alice, 16
        pg.generate_message(
            data=pg.decimal_to_bits(random.randint(0, 2 ** (data_length - 1)),
                                    data_length),
            source=source, destination=destination)

    preprocessor = Preprocessor(_bitvectors(pg))
    possible_syncs = preprocessor.find_possible_syncs()
    assert len(possible_syncs) == 1
    # +0000 is okay; it gets fixed by correction in FormatFinder
    assert possible_syncs[0] in (ProtocolGenerator.to_bits(sync),
                                 ProtocolGenerator.to_bits(sync) + "0000")


def test_with_given_preamble_and_sync():
    preamble, sync = "10101010", "10011"
    pg = build_protocol_generator([(preamble, sync)], (20,), (lambda i: 10 * i,))
    preprocessor = Preprocessor(
        _bitvectors(pg),
        existing_message_types={i: msg.message_type
                                for i, msg in enumerate(pg.protocol.messages)})
    preamble_starts, preamble_lengths, sync_len = preprocessor.preprocess()
    assert all(start == 0 for start in preamble_starts)
    assert all(length == len(preamble) for length in preamble_lengths)
    assert sync_len == len(sync)


def test_merge_by_prefix_matches_pairwise_oracle():
    """The vectorized merge (bincount + packed-limb prefix keys) must be
    value-identical to the straightforward per-pair accumulation it
    replaced, across random word sets including >63-bit words (both the
    single-uint64 fast path and the multi-limb path)."""
    import numpy as np

    from urh_tpu.awre.preprocessor import _pack_words, merge_by_prefix

    def oracle(scores, min_len):
        if len(scores) < 2:
            return dict(scores)
        words = list(scores)
        weight = np.fromiter((scores[w] for w in words), dtype=np.float64,
                             count=len(words))
        mat, lens = _pack_words(words)
        disagree = mat[:, None, :] != mat[None, :, :]
        prefix = disagree.argmax(axis=2)
        prefix[~disagree.any(axis=2)] = mat.shape[1]
        prefix = np.minimum(prefix, np.minimum(lens[:, None], lens[None, :]))
        merged = {}
        rows, cols = np.triu_indices(len(words), k=1)
        long_enough = prefix[rows, cols] > min_len
        for r, c in zip(rows[long_enough], cols[long_enough]):
            key = words[r][: prefix[r, c]]
            merged[key] = merged.get(key, 0) + weight[r] + weight[c]
        for r, c in zip(rows[~long_enough], cols[~long_enough]):
            merged[words[r]] = merged.get(words[r], 0) + weight[r]
            merged[words[c]] = merged.get(words[c], 0) + weight[c]
        return merged

    rng = np.random.default_rng(5)
    for trial in range(60):
        k = int(rng.integers(2, 30))
        max_len = 50 if trial % 2 else 100  # both key paths
        words = {}
        for _ in range(k):
            n = int(rng.integers(4, max_len))
            words[bytes(rng.choice([48, 49], n))] = float(rng.integers(1, 10))
        min_len = int(rng.integers(0, 20))
        expected = oracle(words, min_len)
        got = merge_by_prefix(words, min_len)
        assert set(expected) == set(got), trial
        for key in expected:
            assert abs(expected[key] - got[key]) < 1e-9, (trial, key)
