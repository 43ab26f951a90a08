"""Test configuration.

Default lane: force the CPU backend with 8 virtual devices so sharding
tests run without TPU hardware, deterministically; tests marked ``tpu``
are skipped.

TPU lane (``URH_TPU_BACKEND=1 pytest -m tpu``): leave the backend alone
(the axon plugin provides the real chip) and run only the ``tpu``-marked
tests, which carry backend-appropriate tolerances.  Only one process may
use the TPU at a time — do not run this lane concurrently with bench.py.
"""

import os

import pytest

_TPU_LANE = bool(os.environ.get("URH_TPU_BACKEND"))

if not _TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # Strongest form first: the env var is honored even by backend plugins
    # that register before jax.config is consulted (e.g. the axon TPU plugin).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

    # Guard against the platform request being silently ignored (a TPU
    # plugin grabbing the backend would make "CPU" precision tests run on
    # TPU and invalidate every tolerance chosen for XLA:CPU).
    assert jax.default_backend() == "cpu", (
        f"tests require the CPU backend but got {jax.default_backend()!r}; "
        "a backend plugin initialized before conftest could force "
        "jax_platforms. Run pytest with JAX_PLATFORMS=cpu in the environment."
    )
    assert len(jax.devices()) >= 8, (
        f"expected >=8 virtual CPU devices for sharding tests, "
        f"got {len(jax.devices())}"
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: runs on the real TPU chip (URH_TPU_BACKEND=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    if _TPU_LANE:
        return  # -m tpu does the selection; everything else runs on TPU too
    skip_tpu = pytest.mark.skip(
        reason="TPU lane only (URH_TPU_BACKEND=1 pytest -m tpu)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture(autouse=True)
def _isolated_settings(tmp_path, monkeypatch):
    """Keep every test away from the user's real settings store
    (~/.config/urh_tpu/settings.json): point the module at a per-test
    directory and drop the cached store."""
    from urh_tpu.util import settings

    monkeypatch.setattr(settings, "_config_dir", str(tmp_path / "config"))
    monkeypatch.setattr(settings, "_settings_file",
                        str(tmp_path / "config" / "settings.json"))
    monkeypatch.setattr(settings, "_store", None)
    yield
