"""Streaming TX: modulate messages on the fly into a shared ring buffer.

Counterpart of urh/signalprocessing/ContinuousModulator.py: a separate
process modulates the message list sequentially into shared memory so
arbitrarily long transmissions never materialize in RAM; the device TX
process drains the ring buffer.
"""

from __future__ import annotations

import time
import multiprocessing

# fork would deadlock the multithreaded JAX parent; always spawn children
_mp = multiprocessing.get_context("spawn")

from urh_tpu.dsp.modulator import Modulator
from urh_tpu.util import settings
from urh_tpu.util.logging import logger
from urh_tpu.util.ringbuffer import RingBuffer


class ContinuousModulator:
    WAIT_TIMEOUT = 0.1

    def __init__(self, messages, modulators, num_repeats=-1):
        self.messages = messages
        self.modulators = modulators
        self.num_repeats = num_repeats  # <= 0 = forever

        self.ring_buffer = RingBuffer(
            int(settings.CONTINUOUS_BUFFER_SIZE_MB * 1e6) // 8,
            dtype=Modulator.get_dtype())

        self.current_message_index = _mp.Value("L", 0)
        self.abort = _mp.Value("i", 0)
        self.process = _mp.Process(target=self.modulate_continuously,
                               args=(self.num_repeats,), daemon=True)

    @property
    def is_running(self):
        return self.process.is_alive()

    def start(self):
        self.abort.value = 0
        try:
            self.process = _mp.Process(target=self.modulate_continuously,
                                   args=(self.num_repeats,), daemon=True)
            self.process.start()
        except RuntimeError as e:
            logger.exception(e)

    def stop(self, clear_buffer=True):
        self.abort.value = 1
        if self.process.is_alive():
            try:
                self.process.join(1.5)
            except RuntimeError as e:
                logger.exception(e)
                self.process.terminate()
        if clear_buffer:
            self.ring_buffer.clear()
        logger.debug("Stopped continuous modulation")

    def modulate_continuously(self, num_repeats):
        # this runs in a spawned child: pin it to CPU so it never contends
        # with the parent for the accelerator (synthesis is lightweight)
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

        rng = iter(int, 1) if num_repeats <= 0 else range(num_repeats)
        for _ in rng:
            if self.abort.value:
                return
            start = self.current_message_index.value
            for i in range(start, len(self.messages)):
                if self.abort.value:
                    return
                message = self.messages[i]
                self.current_message_index.value = i
                modulator = self.modulators[message.modulator_index]
                modulated = modulator.modulate(start=0, data=message.encoded_bits,
                                               pause=message.pause)
                while not self.ring_buffer.will_fit(len(modulated)):
                    if self.abort.value:
                        return
                    time.sleep(self.WAIT_TIMEOUT)
                self.ring_buffer.push(modulated.data)
            self.current_message_index.value = 0
