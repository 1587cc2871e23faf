"""CLI entry points mirroring the reference drivers (ISLETrain/ISLEInfer)."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor ISLE_PLATFORM=cpu|tpu|axon before any jax backend init.

    This environment's site customization pins JAX_PLATFORMS at import
    time, so a plain env var cannot redirect the backend; the supported
    switch is jax.config.update *before* first device use (CLAUDE.md).
    The parity harness uses this to run the rebuild on the CPU backend
    next to the reference binary without depending on the TPU tunnel.
    """
    plat = os.environ.get("ISLE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
