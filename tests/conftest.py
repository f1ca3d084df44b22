"""Test harness: CPU backend with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4 implication).

The axon TPU plugin registers itself from sitecustomize and overrides
``jax_platforms``, so env vars alone don't stick — the config update below
does (backends initialize lazily at first use).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
