"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual CPU mesh per the build contract.

Note: this machine's sitecustomize registers the 'axon' TPU plugin and
forces ``jax_platforms=axon,cpu`` via jax.config (which outranks the
JAX_PLATFORMS env var), so we must override through jax.config as well —
before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Auth fails closed in production; tests opt into the dev key explicitly
# (matching the reference's SHODH_DEV_API_KEY contract).
os.environ.setdefault("SHODH_DEV_API_KEY", "dev-key-shodh-tpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_store_dir(tmp_path):
    return str(tmp_path / "store")
