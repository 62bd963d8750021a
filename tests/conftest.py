"""Test configuration: simulate an 8-device TPU mesh on CPU.

Multi-chip sharding is validated without TPU hardware by forcing the JAX CPU
backend to expose 8 virtual devices (the TPU analogue of testing multi-node
code without a cluster). Must run before jax is imported anywhere.
"""

import os

# Force CPU even when the ambient environment points at a real TPU:
# on TPU hosts a sitecustomize registers the TPU PJRT plugin and pins
# the platform via jax config, which overrides the JAX_PLATFORMS env
# var — so pin it back through jax.config below. Unit tests must be
# hardware-independent and use the 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from kirag_tpu.parallel import create_mesh

    return create_mesh()  # all 8 devices on the data axis


@pytest.fixture
def rng():
    return np.random.RandomState(0)
