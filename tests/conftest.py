"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY §4 implication: multi-chip
correctness via xla_force_host_platform_device_count mesh emulation).

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin and
force-selects it, so the env var alone is not enough — we must override via
jax.config after import, before any backend initialization.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
