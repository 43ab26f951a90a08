"""Participant auto assignment by address and RSSI clustering
(urh/awre/AutoAssigner.py)."""

from __future__ import annotations

import numpy as np


def auto_assign_participants(messages, participants):
    if len(participants) == 0:
        return
    if len(participants) == 1:
        for message in messages:
            message.participant = participants[0]
        return

    # by SRC_ADDRESS label matching participant address
    for msg in filter(lambda m: m.participant is None, messages):
        src_address = msg.get_src_address_from_data()
        if src_address:
            try:
                msg.participant = next(p for p in participants if p.address_hex == src_address)
            except StopIteration:
                pass

    # remaining ones by RSSI clustering
    rssis = np.array([msg.rssi for msg in messages], dtype=np.float32)
    if len(rssis) == 0:
        return
    min_rssi, max_rssi = float(np.min(rssis)), float(np.max(rssis))
    center_spacing = (max_rssi - min_rssi) / (len(participants) - 1)
    centers = [min_rssi + i * center_spacing for i in range(len(participants))]

    rssi_assigned_centers = [int(np.argmin(np.abs(rssi - np.array(centers)))) for rssi in rssis]

    participants.sort(key=lambda participant: participant.relative_rssi)
    for message, center_index in zip(messages, rssi_assigned_centers):
        if message.participant is None:
            message.participant = participants[center_index]


def auto_assign_participant_addresses(messages, participants):
    participants_without_address = [p for p in participants if not p.address_hex]
    if len(participants_without_address) == 0:
        return
    for msg in messages:
        if msg.participant in participants_without_address:
            src_address = msg.get_src_address_from_data()
            if src_address:
                participants_without_address.remove(msg.participant)
                msg.participant.address_hex = src_address
