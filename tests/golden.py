"""Access to the reference golden captures (recorded IQ with known bits).

The captures live in the read-only reference checkout; tests that need
them skip when it is unavailable.
"""

import os

import pytest

REF_DATA = os.environ.get("URH_TPU_REF_DATA", "/root/reference/tests/data")


def get_path_for_data_file(name: str) -> str:
    path = os.path.join(REF_DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"golden capture {name} not available")
    return path
