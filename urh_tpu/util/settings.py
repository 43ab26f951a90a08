"""Typed key/value configuration store.

Counterpart of urh/settings.py (QSettings-backed there); here a plain
JSON file under ``~/.config/urh_tpu/`` plus module-level constants.
"""

from __future__ import annotations

import json
import os
import tempfile

# -- constants (settings.py:24-60 in the reference) -------------------------
MAX_RECENT_FILE_NR = 10
PIXELS_PER_PATH = 5000
SPECTRUM_BUFFER_SIZE = 2 ** 15
SNIFF_BUFFER_SIZE = 5 * 10 ** 7
CONTINUOUS_BUFFER_SIZE_MB = 50
PAUSE_TRESHOLD = 10
RECT_BIT_WIDTH = 10
SEPARATION_ROWS = 3
SEPARATION_PADDING = 30

_config_dir = os.path.join(
    os.environ.get("XDG_CONFIG_HOME", os.path.join(os.path.expanduser("~"), ".config")),
    "urh_tpu",
)
_settings_file = os.path.join(_config_dir, "settings.json")

_store = None
OVERWRITE_RECEIVE_BUFFER_SIZE = None  # for tests


def config_dir() -> str:
    return _config_dir


def _load():
    global _store
    if _store is None:
        try:
            with open(_settings_file) as f:
                _store = json.load(f)
        except (OSError, ValueError):
            _store = {}
    return _store


def read(key, default_value=None, type=str):
    store = _load()
    value = store.get(key, default_value)
    if value is None:
        return None
    try:
        if type is bool:
            return value in (True, "true", "True", 1, "1")
        return type(value)
    except (TypeError, ValueError):
        return default_value


def write(key, value):
    store = _load()
    store[key] = value
    try:
        os.makedirs(_config_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=_config_dir)
        with os.fdopen(fd, "w") as f:
            json.dump(store, f, indent=1)
        os.replace(tmp, _settings_file)
    except OSError:
        pass


def all_keys():
    return list(_load().keys())


def sync():
    pass


def get_receive_buffer_size(resume_on_full_receive_buffer: bool, spectrum_mode: bool) -> int:
    """Receive-buffer sizing policy (settings.py:184-213)."""
    if OVERWRITE_RECEIVE_BUFFER_SIZE:
        return OVERWRITE_RECEIVE_BUFFER_SIZE
    if resume_on_full_receive_buffer:
        return SPECTRUM_BUFFER_SIZE if spectrum_mode else SNIFF_BUFFER_SIZE
    # unlimited-ish: bounded by a RAM-threshold heuristic
    num_samples = SNIFF_BUFFER_SIZE
    try:
        import psutil

        threshold = read("ram_threshold", 0.6, float)
        available = threshold * psutil.virtual_memory().available
        num_samples = int(available / 8)
    except ImportError:
        pass
    return min(num_samples, 10 ** 9)


# -- decoding chain name constants (settings.py:89-102 in the reference) --
# canonical definitions live in urh_tpu.coding.encodings; re-exported here
# so callers can address them the same way as in the reference
DECODING_INVERT = "Invert"
DECODING_DIFFERENTIAL = "Differential Encoding"
DECODING_REDUNDANCY = "Remove Redundancy"
DECODING_DATAWHITENING = "Remove Data Whitening (CC1101)"
DECODING_CARRIER = "Remove Carrier"
DECODING_BITORDER = "Change Bitorder"
DECODING_EDGE = "Edge Trigger"
DECODING_SUBSTITUTION = "Substitution"
DECODING_EXTERNAL = "External Program"
DECODING_ENOCEAN = "Wireless Short Packet (WSP)"
DECODING_CUT = "Cut before/after"
DECODING_MORSE = "Morse Code"
DECODING_DISABLED_PREFIX = "[Disabled] "
