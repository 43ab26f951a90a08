"""Ports of reference tests/test_interval.py and tests/test_messagetype.py."""

from urh_tpu.protocol.labels import Interval, MessageType, ProtocolLabel


def test_is_overlapping():
    i1 = Interval(40, 64)
    i2 = Interval(64, 104)
    assert not i1.overlaps_with(i2)
    assert not i2.overlaps_with(i1)
    assert i1.overlaps_with(i1)
    assert i2.overlaps_with(i2)


def test_find_common_interval():
    i1 = Interval(0, 32)
    assert i1.find_common_interval(i1) == i1

    i2 = Interval(0, 80)
    assert i2.find_common_interval(i2) == i2

    assert i1.overlaps_with(i2)
    assert i2.overlaps_with(i1)
    assert i1.find_common_interval(i2) == Interval(0, 32)
    assert i2.find_common_interval(i1) == Interval(0, 32)

    i1 = Interval(41, 56)
    i2 = Interval(43, 56)
    assert i1.find_common_interval(i2) == Interval(43, 56)
    assert i2.find_common_interval(i1) == Interval(43, 56)

    assert Interval(0, 10).find_common_interval(Interval(20, 30)) is None


def test_interval_sort():
    i1 = Interval(0, 10)
    i2 = Interval(0, 20)
    i3 = Interval(0, 30)
    s = {i1, i2, i3}
    assert max(s) == i3
    assert sorted(s)[-1] == i3


def test_find_unlabeled_range():
    lbl11 = ProtocolLabel(name="Label 1.1", start=2, end=10, color_index=0)
    lbl12 = ProtocolLabel(name="Label 1.2", start=15, end=20, color_index=0)
    lbl13 = ProtocolLabel(name="Label 1.3", start=40, end=60, color_index=0)

    mt1 = MessageType(name="MT1", iterable=[lbl11, lbl12, lbl13])

    assert mt1.unlabeled_ranges == [(0, 2), (11, 15), (21, 40), (61, None)]
    assert mt1.unlabeled_ranges_with_other_mt(mt1) == \
        [(0, 2), (11, 15), (21, 40), (61, None)]

    lbl21 = ProtocolLabel(name="Label 2.1", start=1, end=11, color_index=0)
    lbl22 = ProtocolLabel(name="Label 2.2", start=14, end=18, color_index=0)
    lbl23 = ProtocolLabel(name="Label 2.3", start=50, end=70, color_index=0)

    mt2 = MessageType(name="MT2", iterable=[lbl21, lbl22, lbl23])

    assert mt1.unlabeled_ranges_with_other_mt(mt2) == \
        mt2.unlabeled_ranges_with_other_mt(mt1)
    assert mt1.unlabeled_ranges_with_other_mt(mt2) == \
        [(0, 1), (11, 14), (21, 40), (71, None)]
