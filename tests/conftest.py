"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding (gaml_tpu.parallel) is exercised without TPU hardware.

The container's sitecustomize imports jax and registers a remote-TPU
backend at interpreter startup, so plain env mutation is too late;
``jax.config.update`` still wins as long as no backend has been used yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# tests exercise the device bulk path deterministically: bypass the
# cold-executable cost-model routing (readset._device_ready)
os.environ.setdefault("GAML_DEV_EAGER", "1")
