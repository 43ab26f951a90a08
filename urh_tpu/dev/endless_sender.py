"""Endless send mode: device TX fed from a shared ring buffer
(urh/dev/EndlessSender.py counterpart)."""

from __future__ import annotations

import numpy as np

from urh_tpu.dev.virtual_device import Mode, VirtualDevice
from urh_tpu.util import settings
from urh_tpu.util.ringbuffer import RingBuffer


class EndlessSender:
    def __init__(self, backend_handler, name: str):
        self._device = VirtualDevice(backend_handler=backend_handler, name=name,
                                     mode=Mode.send)
        self.ringbuffer = RingBuffer(int(settings.CONTINUOUS_BUFFER_SIZE_MB * 10 ** 6) // 8,
                                     self._device.data_type)
        self._device.continuous_send_ring_buffer = self.ringbuffer
        self._device.is_send_continuous = True

    @property
    def device(self) -> VirtualDevice:
        return self._device

    @device.setter
    def device(self, value: VirtualDevice):
        self._device = value
        self._device.is_send_continuous = True
        self.ringbuffer = RingBuffer(int(settings.CONTINUOUS_BUFFER_SIZE_MB * 10 ** 6) // 8,
                                     self._device.data_type)
        self._device.continuous_send_ring_buffer = self.ringbuffer

    @property
    def device_name(self) -> str:
        return self.device.name

    @device_name.setter
    def device_name(self, value: str):
        if value != self.device_name:
            self.device = VirtualDevice(backend_handler=self.device.backend_handler,
                                        name=value, mode=Mode.send)

    def start(self):
        self.device.num_sending_repeats = 0
        self.device.start()

    def stop(self):
        self.device.stop("EndlessSender stopped.")

    def push_data(self, data: np.ndarray):
        self.ringbuffer.push(data)
