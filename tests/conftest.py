"""Test harness config: run everything on CPU with a virtual 8-device mesh.

Mirrors the strategy in SURVEY.md §4: multi-host logic is exercised without a
cluster via `--xla_force_host_platform_device_count=8`, and Pallas kernels run
in interpret mode on CPU (selected automatically by the kernel wrappers).
Must set the env vars BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and
# force-overrides jax_platforms to "axon,cpu" — which would make every test
# process dial (and serialize on) the single TPU tunnel. Tests are CPU-only
# by design; the explicit config.update below wins over that override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
