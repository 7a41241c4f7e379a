"""Multi-host bootstrap for pod-slice training (SURVEY.md §5.8).

The reference has no distributed backend at all (single-GPU torch); on a
TPU pod slice, multi-process JAX needs one `jax.distributed.initialize()`
per host before any array op, after which `jax.devices()` spans the slice
and the `("data","gauss","tile")` mesh from `parallel.mesh.make_mesh`
covers all hosts. The train CLI calls `maybe_initialize_distributed()`
first thing; it is a no-op in single-process runs, so local workflows are
unaffected.

Layout guidance (DESIGN.md "Scaling model"): keep the `data` axis OUTERMOST
so the only DCN-crossing collective is the per-step gradient `pmean`
(~8 MB at 128k capacity); `gauss`/`tile` stay inside a host's ICI domain —
`make_mesh` reshapes `jax.devices()` in exactly that order.

Data loading is per-host: every process loads the full (small) frame list,
and the `shard_map(in_specs=P("data"))` step slices each host's rows from
the globally-stacked batch. Frames are MBs; a distributed loader would add
complexity with no measurable win at RoDyGS scales.
"""

from __future__ import annotations

import os


def barrier(tag: str = "rodygs_ckpt") -> None:
    """Cross-process barrier; no-op in single-process runs.

    Used around shared-filesystem writes: the primary writes a checkpoint,
    every process barriers, and only then may any process read it. Without
    this, a non-primary that reaches `load_resume` before the primary's
    `os.replace` lands sees FileNotFoundError while the primary blocks in
    the next collective (the exact round-4 smoke failure mode)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def wait_for_path(path, timeout_s: float = 120.0, poll_s: float = 0.25):
    """Bounded wait for a shared-filesystem path to become visible.

    Multi-process only (shared NFS/GCS-fuse mounts can lag the writer by
    seconds); single-process runs return immediately and let the caller's
    open() raise its own error for a genuinely missing file."""
    import os
    import time

    import jax

    if jax.process_count() <= 1:
        return
    deadline = time.monotonic() + timeout_s
    while not os.path.exists(path):
        if time.monotonic() >= deadline:
            raise FileNotFoundError(
                f"{path} not visible on process {jax.process_index()} "
                f"after {timeout_s:.0f}s")
        time.sleep(poll_s)


def broadcast_flag(value: bool) -> bool:
    """All processes adopt the PRIMARY's boolean (e.g. 'resume.ckpt
    exists'). Divergent per-process filesystem views must never split
    control flow across a collective program — one process entering
    `load_resume` while another skips it deadlocks the mesh."""
    import jax

    if jax.process_count() <= 1:
        return bool(value)
    import numpy as np
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(
        np.asarray([1 if value else 0], np.int32))
    return bool(np.asarray(out)[0])


def is_primary() -> bool:
    """True when this process owns shared-filesystem writes (checkpoints,
    code snapshots, eval PNGs/result.yaml, videos).

    Multi-host runs share one logdir; without this gate every process
    would race the same `resume.ckpt`/`static_last.ckpt`/PNG paths (N×
    writes, torn files). The reference is single-process and has no
    equivalent. Single-process runs: trivially True."""
    import jax

    return jax.process_index() == 0


def maybe_initialize_distributed(logger=None) -> bool:
    """Initialize multi-process JAX when launched under a multi-host
    runtime; no-op otherwise.

    Recognized environments, in order:
      * explicit: RODYGS_COORDINATOR (host:port) + RODYGS_NUM_PROCESSES +
        RODYGS_PROCESS_ID
      * TPU pod slice metadata (Cloud TPU): `jax.distributed.initialize()`
        with no args auto-discovers coordinator/count/id
      * none of the above: return False without touching jax.distributed

    Returns True when a multi-process runtime was initialized.
    """
    import jax

    coord = os.environ.get("RODYGS_COORDINATOR")
    # multi-host TPU runtimes list >1 worker hostname (a single-worker
    # value also appears on some single-chip setups — not multi-host)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto = "," in workers or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coord:
        num = int(os.environ["RODYGS_NUM_PROCESSES"])
        pid = int(os.environ["RODYGS_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num, process_id=pid)
    elif auto:
        # Cloud TPU pod runtime: auto-discovery path. Initialization must
        # never break a run that would work single-host — warn and
        # continue if the backend was already touched or discovery fails.
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            import warnings

            warnings.warn(f"multi-host initialization skipped: {e}")
            return False
    else:
        return False
    if logger is not None:
        logger.info(
            f"distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.device_count()} devices total")
    return True
