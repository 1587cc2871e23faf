"""Test environment: hermetic CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware (the
idiomatic substitute for a multi-node harness; see SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
