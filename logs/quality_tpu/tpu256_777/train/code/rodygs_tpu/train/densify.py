"""Adaptive density control on a fixed-capacity store: clone, split, prune,
opacity reset — all as masked in-place scatters inside jit.

Capability parity with `ThreeDGSTrainer.densify_and_{clone,split,prune}` /
`reset_opacity` (`src/trainer/rodygs_static.py:151-319`) and the optimizer
surgery of `src/trainer/utils.py:15-95`:

  * clone: screen-grad >= threshold AND max scale <= percent_dense*extent
    -> copy the Gaussian (new copy gets zero Adam moments, like the
    reference's zero-padded `cat_tensors_to_optimizer`).
  * split: screen-grad >= threshold AND max scale > percent_dense*extent
    -> two children at positions sampled from the parent Gaussian, scales
    divided by (0.8*N); the parent is pruned.
  * prune: opacity < min_opacity, optionally world size > 0.1*extent.
  * opacity reset: opacity <- min(opacity, 0.01) with that leaf's Adam
    moments zeroed (`replace_tensor_to_optimizer`).

Reference quirk, reproduced faithfully: `densify_and_prune` reads
`self.max_radii2D` AFTER `densification_postfix` has zeroed it
(`rodygs_static.py:169-180,285-300` — postfix runs inside both the clone and
the split step), so the screen-radius prune (`big_points_vs`) never fires in
the reference — only the world-size prune (`big_points_ws`) is live when
`max_screen_size` is set. This is the well-known upstream 3DGS behavior the
reference inherits. `apply_screen_size_prune=True` opts into the evidently
intended semantics (prune Gaussians whose accumulated screen radius exceeds
`max_screen_size`).

The reference appends clones/split children BEFORE its final prune, so an
appended entry survives iff its own inherited values pass the prune
(opacity >= min_opacity; child max scale <= 0.1*extent when max_screen_size
is set — appended entries have zero max_radii2D, so the screen-radius branch
cannot hit them even under the opt-in fix). Placement here applies exactly
that predicate analytically, and a split always frees its parent slot, so
the end state matches the reference's exactly (up to split-sample noise) —
verified by the numpy transliteration in tests/test_densify_ref.py.

TPU-first redesign: the reference reallocates tensors and rewrites Adam state
dicts every densification (forcing host sync + new tensor sizes). Here the
capacity never changes: freed slots (dead + pruned + split parents) are
re-ranked with a cumsum, new Gaussians scatter into them, and Adam moments are
zeroed by the same masks. One compiled program, zero reallocation. If more new
Gaussians are requested than free slots exist, the surplus is dropped and
reported in `DensifyInfo.dropped` (the reference instead grows without bound —
capacity pressure is surfaced to the caller, which may re-allocate a larger
store between jit calls).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import (
    GaussianStore,
    get_opacity,
    get_scaling,
    inverse_sigmoid,
)
from ..ops.quaternion import quat_normalize, quat_to_matrix


class DensifyStats(NamedTuple):
    """Accumulated screen-space gradient statistics
    (`xyz_gradient_accum`, `denom`, `max_radii2D`)."""

    grad_accum: jnp.ndarray   # [C]
    denom: jnp.ndarray        # [C]
    max_radii2d: jnp.ndarray  # [C] float (pixel radii)


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(grad_accum=z, denom=z, max_radii2d=z)


def accumulate_stats(stats: DensifyStats, means2d_grad: jnp.ndarray,
                     radii: jnp.ndarray, visible: jnp.ndarray) -> DensifyStats:
    """Per-step update (`add_densification_stats` + max-radii tracking,
    `rodygs_static.py:395-403,424-427`). `means2d_grad` is [2, C] in the
    reference's scaled-NDC units."""
    gnorm = jnp.sqrt(means2d_grad[0] ** 2 + means2d_grad[1] ** 2)
    vis = visible.astype(jnp.float32)
    return DensifyStats(
        grad_accum=stats.grad_accum + gnorm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                jnp.where(visible, radii, 0.0)),
    )


class DensifyInfo(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    dropped: jnp.ndarray   # new Gaussians that did not fit in capacity


def _rank_free_slots(free_mask: jnp.ndarray) -> jnp.ndarray:
    """slot_of_rank[r] = index of the r-th free slot (C where none)."""
    c = free_mask.shape[0]
    ranks = jnp.where(free_mask, jnp.cumsum(free_mask) - 1, c)
    slot_of_rank = jnp.full((c,), c, jnp.int32)
    return slot_of_rank.at[ranks].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")


def densify_and_prune(
    store: GaussianStore,
    aux: dict[str, Any],
    stats: DensifyStats,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    max_screen_size: float | None,
    isotropic: bool = False,
    apply_screen_size_prune: bool = False,
) -> tuple[GaussianStore, dict[str, Any], DensifyStats, DensifyInfo]:
    """One densification pass.

    `aux` is a pytree of extra per-Gaussian arrays with leading dim C that
    must follow slot moves: Adam moments of every param leaf, and (for the
    dynamic model) `motion_coeff` + its moments. New slots get:
      * param copies from their source (xyz/scaling adjusted for split),
      * ZEROED entries for any aux leaf whose name starts with 'mu_'/'nu_'
        (Adam surgery semantics) — callers pass moments under such names.
    """
    p = store.params
    c = p.xyz.shape[0]
    alive = store.alive

    grads = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    scaling = get_scaling(p, isotropic)
    max_scale = jnp.max(scaling, axis=1)
    opacity = get_opacity(p)

    high_grad = (grads >= max_grad) & alive
    clone_src = high_grad & (max_scale <= percent_dense * extent)
    split_src = high_grad & (max_scale > percent_dense * extent)
    n_split_children = 2

    # Reference order is append-then-prune: an appended clone/child survives
    # iff its own inherited values pass the final prune. Appended entries
    # have zero max_radii2D, so the screen-radius branch can never hit them
    # (even under the opt-in fix) — only opacity and world size apply.
    survives = ~(opacity < min_opacity)
    if max_screen_size is not None:
        child_max_scale = max_scale / (0.8 * n_split_children)
        clone_mask = clone_src & survives & ~(max_scale > 0.1 * extent)
        place_mask = split_src & survives & ~(child_max_scale > 0.1 * extent)
    else:
        clone_mask = clone_src & survives
        place_mask = split_src & survives

    prune_mask = (opacity < min_opacity) & alive
    if max_screen_size is not None:
        # World-size prune is live in the reference; the screen-radius prune
        # is a dead path there (module docstring) — opt-in via
        # apply_screen_size_prune.
        prune_mask = prune_mask | (alive & (max_scale > 0.1 * extent))
        if apply_screen_size_prune:
            prune_mask = prune_mask | (
                alive & (stats.max_radii2d > max_screen_size))

    # A split ALWAYS frees its parent slot (the reference's prune_filter),
    # whether or not the children are placed.
    keep_mask = alive & ~prune_mask & ~split_src
    free_mask = ~keep_mask
    slot_of_rank = _rank_free_slots(free_mask)
    num_free = jnp.sum(free_mask.astype(jnp.int32))

    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    # ranks: clones first, then 2 children per placed split.
    clone_rank = jnp.where(clone_mask, jnp.cumsum(clone_mask) - 1, c)
    split_base = n_clone + 2 * (jnp.cumsum(place_mask) - 1)
    split_rank0 = jnp.where(place_mask, split_base, c)
    split_rank1 = jnp.where(place_mask, split_base + 1, c)

    def dest(rank):
        ok = rank < num_free
        return jnp.where(ok, slot_of_rank[jnp.clip(rank, 0, c - 1)], c)

    dest_clone = dest(clone_rank)
    dest_s0 = dest(split_rank0)
    dest_s1 = dest(split_rank1)
    src = jnp.arange(c, dtype=jnp.int32)

    # --- split child parameters -------------------------------------------
    rot = quat_to_matrix(quat_normalize(p.rotation))  # [C,3,3]
    k0, k1 = jax.random.split(key)
    samp0 = jax.random.normal(k0, (c, 3)) * scaling
    samp1 = jax.random.normal(k1, (c, 3)) * scaling
    child_xyz0 = p.xyz + jnp.einsum("nij,nj->ni", rot, samp0)
    child_xyz1 = p.xyz + jnp.einsum("nij,nj->ni", rot, samp1)
    child_scaling = jnp.log(scaling / (0.8 * n_split_children))
    if isotropic:
        child_scaling = child_scaling[:, :1]

    def move(leaf, clone_val=None, s0_val=None, s1_val=None, zero_new=False):
        """Keep survivors, scatter new entries into their dest slots."""
        base = jnp.where(
            keep_mask.reshape((c,) + (1,) * (leaf.ndim - 1)), leaf, 0)
        if zero_new:
            return base
        cv = leaf if clone_val is None else clone_val
        s0 = leaf if s0_val is None else s0_val
        s1 = leaf if s1_val is None else s1_val
        base = base.at[dest_clone].set(cv[src], mode="drop")
        base = base.at[dest_s0].set(s0[src], mode="drop")
        base = base.at[dest_s1].set(s1[src], mode="drop")
        return base

    new_params = type(p)(
        xyz=move(p.xyz, s0_val=child_xyz0, s1_val=child_xyz1),
        features_dc=move(p.features_dc),
        features_rest=move(p.features_rest),
        scaling=move(p.scaling, s0_val=child_scaling, s1_val=child_scaling),
        rotation=move(p.rotation),
        opacity=move(p.opacity),
    )
    new_aux = {
        name: jax.tree.map(
            lambda leaf: move(
                leaf, zero_new=name.startswith(("mu_", "nu_"))), tree)
        for name, tree in aux.items()
    }

    new_alive = keep_mask
    ok_clone = dest_clone < c
    ok_s0 = dest_s0 < c
    ok_s1 = dest_s1 < c
    new_alive = new_alive.at[jnp.where(ok_clone, dest_clone, c)].set(
        True, mode="drop")
    new_alive = new_alive.at[jnp.where(ok_s0, dest_s0, c)].set(True, mode="drop")
    new_alive = new_alive.at[jnp.where(ok_s1, dest_s1, c)].set(True, mode="drop")

    new_store = GaussianStore(
        params=new_params,
        alive=new_alive,
        time=move(store.time),
        time_ind=move(store.time_ind),
    )

    requested = n_clone + 2 * jnp.sum(place_mask.astype(jnp.int32))
    placed = (jnp.sum((ok_clone & clone_mask).astype(jnp.int32))
              + jnp.sum((ok_s0 & place_mask).astype(jnp.int32))
              + jnp.sum((ok_s1 & place_mask).astype(jnp.int32)))
    info = DensifyInfo(
        num_cloned=n_clone,
        num_split=jnp.sum(split_src.astype(jnp.int32)),
        num_pruned=jnp.sum(prune_mask.astype(jnp.int32)),
        dropped=requested - placed,
    )
    # Stats reset after densification (`densification_postfix`).
    return new_store, new_aux, init_stats(c), info


def reset_opacity(store: GaussianStore, mu_opacity: jnp.ndarray,
                  nu_opacity: jnp.ndarray):
    """`reset_opacity` (`rodygs_static.py:151-160`): clamp opacity to <= 0.01
    and zero that leaf's Adam moments."""
    op = get_opacity(store.params)[:, None]
    new_op = inverse_sigmoid(jnp.minimum(op, 0.01))
    new_op = jnp.where(store.alive[:, None], new_op, store.params.opacity)
    params = store.params._replace(opacity=new_op)
    return (store._replace(params=params),
            jnp.zeros_like(mu_opacity), jnp.zeros_like(nu_opacity))
