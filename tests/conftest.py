"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware, deterministically."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Strongest form first: the env var is honored even by backend plugins that
# register before jax.config is consulted (e.g. the axon TPU plugin).
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

# Guard against the platform request being silently ignored (a TPU plugin
# grabbing the backend would make "CPU" precision tests run on TPU and
# invalidate every tolerance chosen for XLA:CPU).  Fail loudly instead.
assert jax.default_backend() == "cpu", (
    f"tests require the CPU backend but got {jax.default_backend()!r}; "
    "a backend plugin initialized before conftest could force jax_platforms. "
    "Run pytest with JAX_PLATFORMS=cpu in the environment."
)
assert len(jax.devices()) >= 8, (
    f"expected >=8 virtual CPU devices for sharding tests, got {len(jax.devices())}"
)


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
