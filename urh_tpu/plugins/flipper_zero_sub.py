"""FlipperZeroSub: export messages to Flipper Zero SubGhz RAW files
(urh/plugins/FlipperZeroSub counterpart)."""

from __future__ import annotations

from urh_tpu.util.logging import logger


from urh_tpu.plugins.manager import SDRPlugin


class FlipperZeroSubPlugin(SDRPlugin):
    def __init__(self):
        super().__init__(name="FlipperZeroSub")
        self.filetype = "Flipper SubGhz RAW File"
        self.version = 1
        self.protocol = "RAW"
        self.max_values_per_line = 512

    def get_furi_hal_string(self, modulation_type, given_bandwidth_deviation=0):
        """Map modulation to the Flipper FuriHal preset string."""
        if modulation_type == "ASK":
            if given_bandwidth_deviation > 500:
                return "FuriHalSubGhzPresetOok650Async", 650
            return "FuriHalSubGhzPresetOok270Async", 270
        if modulation_type == "FSK":
            if given_bandwidth_deviation > 20:
                return "FuriHalSubGhzPreset2FSKDev476Async", 47.6
            return "FuriHalSubGhzPreset2FSKDev238Async", 2.38
        if modulation_type == "GFSK":
            return "FuriHalSubGhzPresetGFSK9_99KbAsync", 19.04
        if modulation_type == "PSK":
            return "FuriHalSubGhzPresetCustom", 238
        return "FuriHalSubGhzPresetOok650Async", 650

    # reference-compatible camelCase alias
    getFuriHalString = get_furi_hal_string

    def write_sub_file(self, filename, messages, sample_rates, modulators, project_manager) -> bool:
        if len(messages) == 0:
            logger.debug("empty signal")
            return False

        try:
            file = open(filename, "w")
        except OSError as e:
            logger.error(f"could not open {filename} for writing: {e}")
            return False

        frequency = int(project_manager.device_conf["frequency"])
        samples_per_symbol = messages[0].samples_per_symbol
        preset, _ = self.get_furi_hal_string(
            modulators[messages[0].modulator_index].modulation_type, 1000)

        file.write(f"Filetype: {self.filetype}\n")
        file.write(f"Version: {self.version}\n")
        file.write(f"Frequency: {frequency}\n")
        file.write(f"Preset: {preset}\n")
        file.write(f"Protocol: {self.protocol}")

        # run-length encode bits: positive counts for 1-runs, negative for 0-runs
        signal = []
        for msg in messages:
            current_value = msg[0]
            current_count = 0
            for bit in msg:
                if bit == current_value:
                    current_count += 1
                else:
                    signal.append(current_count if current_value == 1 else -current_count)
                    current_count = 1
                    current_value = bit
            signal.append(current_count if current_value == 1 else -current_count)

        for i in range(len(signal)):
            if i % self.max_values_per_line == 0:
                file.write("\nRAW_Data:")
            file.write(f" {signal[i] * samples_per_symbol}")

        file.close()
        return True
