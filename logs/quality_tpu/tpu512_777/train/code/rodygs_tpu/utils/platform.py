"""Platform selection that survives this environment's sitecustomize.

The axon site hook force-sets `jax_platforms=axon,cpu` in every process,
*overriding* the standard `JAX_PLATFORMS` environment variable — so a user
asking for a CPU run still dials (and hangs on, when the tunnel is down)
the TPU. Entry points call `respect_jax_platforms_env()` before first
backend use to restore the env var's meaning. No-op when the var is unset.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)
