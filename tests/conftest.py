"""Test environment: hermetic CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware (the
idiomatic substitute for a multi-node harness; see SURVEY.md §4).

Note: this environment's site customization pins JAX_PLATFORMS=axon (the
real TPU tunnel) at import, so env vars alone do not stick — we must also
update the jax config before any backend initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost on this 1-vCPU host is
# dominated by XLA compiles (shrinking test shapes barely moves wall
# time); warm reruns skip every big compile. Cold first run pays a small
# write overhead.
jax.config.update("jax_compilation_cache_dir", "/tmp/isle_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
