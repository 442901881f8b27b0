"""Test config: run everything on a virtual 8-device CPU mesh.

The real TPU is a single remote chip with slow remote compiles; tests pin
JAX's default device to the host CPU backend and expose 8 virtual CPU
devices so multi-chip sharding paths execute for real (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def naive_suffix_array(b: bytes) -> np.ndarray:
    """O(n^2 log n) oracle for small inputs."""
    return np.asarray(sorted(range(len(b)), key=lambda i: b[i:]), dtype=np.int32)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def corpus():
    from stringsearch_tpu.harness.corpus import regression_corpus

    return regression_corpus()
