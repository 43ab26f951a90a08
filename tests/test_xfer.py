"""Complex host<->device transfer shims (urh_tpu.core.xfer).

The real-TPU tunnel cannot transfer complex dtypes; these tests pin the
plane-based shim's semantics on the CPU backend (where both routes work)
so any drift would also break the TPU route.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from urh_tpu.core.xfer import to_device, to_host


def test_complex_roundtrip():
    x = (np.random.default_rng(0).normal(size=1000)
         + 1j * np.random.default_rng(1).normal(size=1000)).astype(np.complex64)
    dev = to_device(x)
    assert dev.dtype == jnp.complex64
    back = to_host(dev)
    assert back.dtype == np.complex64
    np.testing.assert_array_equal(back, x)


def test_complex128_standardized_to_complex64():
    x = np.array([1 + 2j, 3 - 4j], dtype=np.complex128)
    dev = to_device(x)
    assert dev.dtype == jnp.complex64
    np.testing.assert_allclose(to_host(dev), x.astype(np.complex64))


def test_real_arrays_pass_through():
    x = np.arange(10, dtype=np.float32)
    dev = to_device(x)
    assert dev.dtype == jnp.float32
    np.testing.assert_array_equal(to_host(dev), x)
    ints = np.arange(5, dtype=np.int32)
    np.testing.assert_array_equal(to_host(to_device(ints)), ints)


def test_to_host_accepts_numpy():
    x = np.array([1 + 1j], dtype=np.complex64)
    assert to_host(x) is x


def test_sharded_placement():
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("b",))
    n_dev = mesh.devices.size
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("b"))
    x = (np.arange(8 * n_dev) + 1j * np.arange(8 * n_dev)).astype(np.complex64)
    dev = to_device(x, sharding)
    assert dev.sharding.is_equivalent_to(sharding, dev.ndim)
    np.testing.assert_array_equal(to_host(dev), x)


def test_multidim_complex():
    x = (np.random.default_rng(2).normal(size=(4, 7, 3))
         + 1j * np.random.default_rng(3).normal(size=(4, 7, 3))).astype(np.complex64)
    np.testing.assert_array_equal(to_host(to_device(x)), x)
