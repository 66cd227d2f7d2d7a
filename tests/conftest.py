"""Test harness configuration.

Forces an 8-device virtual CPU mesh (JAX's standard fake-multi-device
mechanism) so data-parallel sharding is exercised without a TPU pod, and
enables x64 for the SDE coefficient pipeline. Must run before any jax
backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

from psld_tpu.utils.hostmem import tune_host_allocator  # noqa: E402

tune_host_allocator()  # slow-page-fault hosts: reuse faulted heap pages

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
