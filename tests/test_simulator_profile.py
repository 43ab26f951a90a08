"""Load the reference's real simulator profile XML and validate the
reconstructed item tree (exercises SimulatorConfiguration.load_from_xml
against wire-format data produced by the original implementation)."""

import xml.etree.ElementTree as ET

from urh_tpu.sim.configuration import SimulatorConfiguration
from urh_tpu.sim.expression_parser import SimulatorExpressionParser
from urh_tpu.sim.items import (SimulatorMessage, SimulatorProtocolLabel,
                               SimulatorRule, SimulatorRuleCondition)
from urh_tpu.util.project import ProjectManager

from tests.golden import get_path_for_data_file


def load_profile():
    path = get_path_for_data_file("testprofile.sim.xml")
    tree = ET.parse(path)
    pm = ProjectManager()
    config = SimulatorConfiguration(pm)
    parser = SimulatorExpressionParser(config)
    config.attach_expression_parser(parser)
    config.load_from_xml(tree.getroot(), message_types=[])
    return config, pm


def test_load_profile_structure():
    config, pm = load_profile()

    messages = config.get_all_messages()
    assert len(messages) == 6

    participants = {p.name for p in pm.participants}
    assert {"Alice", "Bob"} <= participants

    # decodings from the profile
    assert any(dec.name == "Wireless Short Packet" for dec in pm.decodings)

    # first message: 32 bits with preamble/sync/seqnum/data/checksum labels
    msg = messages[0]
    assert isinstance(msg, SimulatorMessage)
    assert len(msg.plain_bits) == 32
    label_names = [lbl.name for lbl in msg.children]
    assert "preamble" in label_names
    assert "checksum" in label_names

    checksum_lbl = next(lbl for lbl in msg.children if lbl.name == "checksum")
    assert checksum_lbl.is_checksum_label
    assert checksum_lbl.label.data_ranges == [[12, 28]]

    # 24 direct simulator labels across the 6 messages (the rest in the
    # profile are message-type label definitions)
    labels = [item for item in config.get_all_items()
              if isinstance(item, SimulatorProtocolLabel)]
    assert len(labels) == 24

    assert config.protocol_valid()


def test_profile_roundtrip():
    config, pm = load_profile()
    saved = config.save_to_xml(standalone=True)

    pm2 = ProjectManager()
    config2 = SimulatorConfiguration(pm2)
    parser2 = SimulatorExpressionParser(config2)
    config2.attach_expression_parser(parser2)
    config2.load_from_xml(saved, message_types=[])

    assert len(config2.get_all_messages()) == len(config.get_all_messages())
    assert [type(i).__name__ for i in config2.rootItem.children] == \
           [type(i).__name__ for i in config.rootItem.children]
