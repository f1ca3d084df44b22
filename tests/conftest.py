"""Test harness: CPU backend with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4 implication).

The axon TPU plugin registers itself from sitecustomize and overrides
``jax_platforms``, so env vars alone don't stick — the config update below
does (backends initialize lazily at first use).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices share one vCPU: collective participants can arrive
# minutes apart, and XLA's default 40 s rendezvous termination timeout
# CHECK-fails the process (observed at production shapes in the dryrun)
for f in ("--xla_cpu_collective_call_warn_stuck_timeout_seconds=600",
          "--xla_cpu_collective_call_terminate_timeout_seconds=3600"):
    if f.split("=")[0] not in flags:
        flags = f"{flags} {f}"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
