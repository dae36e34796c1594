"""Test configuration: force the CPU backend (tests validate numerics in
float64, which the TPU v5e does not support) and expose 8 virtual devices for
multi-chip sharding tests."""

import os

# Must happen before jax initializes its backends.  Save the original
# platform selection first: the opt-in device tests (test_tpu_device.py)
# spawn subprocesses that must restore the accelerator env (in this
# environment the TPU registers only when JAX_PLATFORMS=axon is set).
if "JAX_PLATFORMS" in os.environ:
    os.environ.setdefault("QUFLOW_ORIG_JAX_PLATFORMS",
                          os.environ["JAX_PLATFORMS"])
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
