"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware, deterministically."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


import pytest


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
