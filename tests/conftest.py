"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the remote-TPU ('axon') backend in
every interpreter, so we must re-point jax at CPU *before any array op runs*
(conftest imports before test modules).  8 virtual CPU devices let every
sharding/collective path (data/model/seq parallel) run in CI without a pod
slice — SURVEY.md §4 "Distributed without a cluster".

Set WAVENET_TPU_TESTS_ON_TPU=1 to run the suite on the real attached chip.
"""

import os

import jax

if not os.environ.get("WAVENET_TPU_TESTS_ON_TPU"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
