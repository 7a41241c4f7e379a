"""Optimizers: functional Adam with per-leaf learning rates + slot-masked
state, and the camera pose optimizer.

Capability parity with the reference's optimizer setup:
  * `ThreeDGSTrainer.optim_setup` — torch.Adam, eps=1e-15, six named param
    groups with distinct LRs, xyz on an exponential-decay schedule
    (`src/trainer/rodygs_static.py:106-141`).
  * `CameraQuatOptimizer` — Adam over per-frame pose params with
    linear-warmup + cosine-annealing LRs (`src/trainer/optim.py:31-91`).
  * The Adam-state "surgery" of `src/trainer/utils.py:15-95` (zero-pad on
    clone/split, mask on prune, reset on opacity replace) becomes masked
    writes into fixed-capacity moment arrays — see train/densify.py.

TPU-first: learning rates are traced values computed inside the jitted step
(ops/schedules.py), so LR scheduling never leaves the XLA program; torch's
host-side `param_group["lr"] = ...` poke has no equivalent here.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any    # first-moment pytree (same structure as params)
    nu: Any    # second-moment pytree
    count: jnp.ndarray  # scalar int32 step counter


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lr: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    update_gate=None,
) -> tuple[Any, AdamState]:
    """One Adam step. `lr` is either a scalar or a pytree of scalars matching
    `params`' structure (the reference's named param groups). Bias correction
    and eps placement follow torch.optim.Adam exactly.

    `update_gate` (traced scalar 0/1, optional): when 0 the step is a
    FULL no-op — params, moments AND count all stay frozen. Zeroing only
    the LR is not enough during a pose-first warmup (`scene_lr_delay`):
    grads computed against still-uncorrected poses would keep folding into
    mu/nu and advancing count, contaminating the first real scene updates
    when the gate lifts (ADVICE r4)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1**t
    c2 = 1.0 - b2**t

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    if isinstance(lr, (int, float)) or (hasattr(lr, "ndim") and lr.ndim == 0):
        lr = jax.tree.map(lambda _: lr, params)

    def step(p, m, v, l):
        return p - l * (m / c1) / (jnp.sqrt(v / c2) + eps)

    new_params = jax.tree.map(step, params, mu, nu, lr)
    if update_gate is not None:
        keep = jnp.asarray(update_gate, jnp.float32) > 0.0
        sel = lambda new, old: jnp.where(keep, new, old)
        new_params = jax.tree.map(sel, new_params, params)
        mu = jax.tree.map(sel, mu, state.mu)
        nu = jax.tree.map(sel, nu, state.nu)
        count = jnp.where(keep, count, state.count)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def sparse_row_adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lr: Any,
    row_mask: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[Any, AdamState]:
    """Adam over a stack of per-row parameters ([F, ...] leaves) where only
    `row_mask` rows received real gradients this step: moments, step counts
    and parameters of the OTHER rows stay frozen instead of decaying toward
    zero.

    Why (framework extra, no reference counterpart): both this framework
    and the reference hold all F camera poses in one [F,...] tensor under
    one Adam, and train round-robin one frame per iteration — so a given
    camera's momentum decays by b1^(F-1) between its visits and its
    effective step shrinks far below the LR. That is fine for MASt3R-grade
    inits (sub-degree error) but cripples recovery from degrees-level pose
    noise. With row masking, round-robin sampling becomes exactly an
    independent per-camera Adam (the camera analog of sparse/masked Adam).
    `state.count` must be a [F] int32 array (see `sparse_row_adam_init`).
    """
    mask = row_mask
    count = state.count + mask.astype(jnp.int32)          # [F]
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1**t                                      # [F]
    c2 = 1.0 - b2**t

    def _b(x, like):  # broadcast [F] against [F, D...]
        return x.reshape(x.shape + (1,) * (like.ndim - 1))

    mu = jax.tree.map(
        lambda m, g: jnp.where(_b(mask, m), b1 * m + (1 - b1) * g, m),
        state.mu, grads)
    nu = jax.tree.map(
        lambda v, g: jnp.where(_b(mask, v), b2 * v + (1 - b2) * g * g, v),
        state.nu, grads)

    if isinstance(lr, (int, float)) or (hasattr(lr, "ndim") and lr.ndim == 0):
        lr = jax.tree.map(lambda _: lr, params)

    def step(p, m, v, l):
        # unvisited rows have c1 == 0; the where() discards their lane
        upd = p - l * (m / jnp.maximum(_b(c1, p), 1e-30)) \
            / (jnp.sqrt(v / jnp.maximum(_b(c2, p), 1e-30)) + eps)
        return jnp.where(_b(mask, p), upd, p)

    new_params = jax.tree.map(step, params, mu, nu, lr)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def sparse_row_adam_init(params: Any, n_rows: int) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((n_rows,), jnp.int32))


class CameraPoses(NamedTuple):
    """Dataset-level learnable poses (the reference's `LazyDataReader`
    parameters `R_c2ws_quat [F,4]`, `T_c2ws [F,3]` —
    `src/data/datamodule.py:419-424`)."""

    q_c2w: jnp.ndarray  # [F, 4]
    t_c2w: jnp.ndarray  # [F, 3]


def camera_lr_tree(step, rotation_lr: float, translation_lr: float,
                   warmup: int, total_steps: int) -> CameraPoses:
    """Per-leaf LR pytree for the camera Adam at a (traced) step."""
    from ..ops.schedules import warmup_cosine_lr

    return CameraPoses(
        q_c2w=warmup_cosine_lr(step, rotation_lr, warmup, total_steps),
        t_c2w=warmup_cosine_lr(step, translation_lr, warmup, total_steps),
    )
