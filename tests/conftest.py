"""Test config: 8 virtual CPU devices (multi-chip simulation) + exact matmuls.

This is the TPU-native answer to "test distributed code without a cluster"
(SURVEY.md §4): JAX meshes are backend-agnostic, so sharding/collective
logic is validated on a forced 8-device CPU topology.
"""

import os

# jax may already be imported by a sitecustomize hook, so set both the env
# vars AND the live config (env alone is read only at import time).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# Unit tests run on the virtual CPU mesh; set NANS_TEST_TPU=1 to run the
# dedicated TPU tests against real hardware instead.
if os.environ.get("NANS_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Exact fp32 matmuls so kernel-vs-oracle comparisons are tight; production
# code uses the TPU default (bf16 multiply / fp32 accumulate).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")
