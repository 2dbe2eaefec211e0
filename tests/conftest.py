"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware, as required by the driver."""

import os
import shutil
import subprocess

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize can force JAX_PLATFORMS=axon (a tunneled
# TPU); tests must run on the local virtual-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

ORACLE_DIR = "/tmp/oracle"
REFERENCE_SRC = "/root/reference/src"


def _build_oracle():
    """Build the reference C binary (if its source is available) to use as a
    differential-test oracle. Never copies reference code into this repo."""
    exe = os.path.join(ORACLE_DIR, "readtape")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REFERENCE_SRC):
        return None
    try:
        os.makedirs(ORACLE_DIR, exist_ok=True)
        for name in os.listdir(REFERENCE_SRC):
            shutil.copy(os.path.join(REFERENCE_SRC, name), ORACLE_DIR)
        subprocess.run(["make"], cwd=ORACLE_DIR, check=True,
                       capture_output=True, timeout=300)
        return exe if os.path.exists(exe) else None
    except Exception:
        return None


@pytest.fixture(scope="session")
def oracle():
    exe = _build_oracle()
    if exe is None:
        pytest.skip("reference oracle binary not available")
    return exe
