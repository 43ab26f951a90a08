"""RfCat: transmit bit messages through an rfcat dongle's interactive
interpreter (urh/plugins/RfCat counterpart without Qt)."""

from __future__ import annotations

import shutil
import threading
import time
from subprocess import PIPE, Popen

from urh_tpu.util import settings
from urh_tpu.util.events import Event
from urh_tpu.util.logging import logger


from urh_tpu.plugins.manager import SDRPlugin


class RfCatPlugin(SDRPlugin):
    def __init__(self):
        super().__init__(name="RfCat")
        self.rfcat_executable = settings.read("rfcat_executable", "rfcat", str)
        self.process = None
        self.rfcat_is_open = False
        self._is_sending = False
        self._sending_interrupt_requested = False
        self.modulators = []
        self.project_manager = None
        self.ready = True

        self.current_send_message_changed = Event(int)
        self.sending_status_changed = Event(bool)

    @property
    def rfcat_is_found(self):
        return self.is_rfcat_executable(self.rfcat_executable)

    @staticmethod
    def is_rfcat_executable(rfcat_executable) -> bool:
        return shutil.which(rfcat_executable) is not None

    @property
    def is_sending(self) -> bool:
        return self._is_sending

    @is_sending.setter
    def is_sending(self, value: bool):
        if value != self._is_sending:
            self._is_sending = value
            self.sending_status_changed.emit(self._is_sending)

    def write_to_rfcat(self, buf: str):
        self.process.stdin.write(buf.encode("utf-8") + b"\n")
        self.process.stdin.flush()

    def open_rfcat(self) -> bool:
        if self.rfcat_is_open:
            return True
        try:
            self.process = Popen([self.rfcat_executable, "-r"], stdin=PIPE,
                                 stdout=PIPE, stderr=PIPE)
            self.rfcat_is_open = True
            logger.debug("opened RfCat ({})".format(self.rfcat_executable))
            return True
        except Exception as e:
            logger.debug("could not open RfCat ({})".format(e))
            return False

    def close_rfcat(self):
        if self.rfcat_is_open:
            try:
                self.process.kill()
                self.rfcat_is_open = False
            except Exception as e:
                logger.debug("could not close rfcat: {}".format(e))

    def set_parameter(self, param: str, log=True) -> bool:
        try:
            self.write_to_rfcat(param)
            self.ready = False
            if log:
                logger.debug(param)
        except OSError as e:
            logger.info("could not set parameter {0} ({1})".format(param, e))
            return True
        return False

    def read_async(self):
        self.set_parameter("d.RFrecv({})[0]".format(500), log=False)

    def configure_rfcat(self, modulation="MOD_ASK_OOK", freq=433920000,
                        sample_rate=2000000, samples_per_symbol=500):
        self.set_parameter("d.setMdmModulation({})".format(modulation), log=False)
        self.set_parameter("d.setFreq({})".format(int(freq)), log=False)
        self.set_parameter("d.setMdmSyncMode(0)", log=False)
        self.set_parameter("d.setMdmDRate({})".format(int(sample_rate // samples_per_symbol)), log=False)
        self.set_parameter("d.setMaxPower()", log=False)
        logger.info("configured RfCat: mod={} freq={}Hz rate={}baud".format(
            modulation, int(freq), int(sample_rate // samples_per_symbol)))

    @staticmethod
    def bit_str_to_bytearray(bits: str) -> bytearray:
        bits += "0" * ((8 - len(bits) % 8) % 8)
        return bytearray(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    def send_data(self, data: bytearray):
        prepared_data = "d.RFxmit(b{})".format(str(bytes(data))[1:])
        return self.set_parameter(prepared_data, log=False)

    MODULATION_MAP = {"ASK": "MOD_ASK_OOK", "FSK": "MOD_2FSK",
                      "GFSK": "MOD_GFSK", "PSK": "MOD_MSK"}

    def _send_messages(self, messages, sample_rates):
        if not len(messages):
            return False
        self.is_sending = True

        if not self.open_rfcat():
            self.is_sending = False
            return False

        modulation = self.MODULATION_MAP.get(
            self.modulators[messages[0].modulator_index].modulation_type, "MOD_ASK_OOK")
        self.configure_rfcat(modulation=modulation,
                             freq=self.project_manager.device_conf["frequency"],
                             sample_rate=sample_rates[0],
                             samples_per_symbol=messages[0].samples_per_symbol)

        repeats = settings.read("num_sending_repeats", 1, int) or -1
        while (repeats > 0 or repeats == -1) and not self._sending_interrupt_requested:
            for i, msg in enumerate(messages):
                if self._sending_interrupt_requested:
                    break
                wait_time = msg.pause / sample_rates[i]
                self.current_send_message_changed.emit(i)
                error = self.send_data(self.bit_str_to_bytearray(msg.encoded_bits_str))
                if not error:
                    time.sleep(wait_time)
                else:
                    break
            if repeats > 0:
                repeats -= 1
        self.is_sending = False
        return True

    def start_message_sending_thread(self, messages, sample_rates):
        self._sending_interrupt_requested = False
        self.sending_thread = threading.Thread(target=self._send_messages,
                                               args=(messages, sample_rates), daemon=True)
        self.sending_thread.start()

    def stop_sending_thread(self):
        self._sending_interrupt_requested = True
        if hasattr(self, "sending_thread"):
            self.sending_thread.join(1)
        self.close_rfcat()
