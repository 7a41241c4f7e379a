"""Static 3DGS trainer: jit-compiled train step over the fixed-capacity store.

Capability parity with `ThreeDGSTrainer` (`src/trainer/rodygs_static.py`):
six-group Adam (eps 1e-15) with the exponential xyz LR schedule, per-step
camera pose optimization, adaptive density control on its schedule, opacity
reset, SH-degree ramp, densification statistics from screen-space mean
gradients.

TPU-first structure: the whole iteration — pose-differentiable render, loss,
backward, Adam for Gaussians AND cameras, stat accumulation — is ONE jitted
XLA program with static shapes. Host code only picks the step variant
(loss active-set x SH degree) and triggers the (also jitted) densify pass on
its interval. The reference's host-side optimizer surgery, LR pokes, and
`.cuda()` traffic have no equivalent here.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models import gaussians as G
from ..ops.schedules import expon_lr
from ..render.camera import Camera
from ..render.compact import (BAND_KEEP_MARGIN, bands_decision, bands_viable,
                              escalation_poll_due, fit_capacity,
                              fragment_capacity, join_profile,
                              profile_for_demand, split_profile)
from ..render.rasterize import render
from .densify import DensifyStats, accumulate_stats, densify_and_prune, init_stats, reset_opacity
from .losses import MultiLoss
from .optim import AdamState, CameraPoses, adam_init, adam_update, camera_lr_tree


@dataclasses.dataclass(frozen=True)
class StaticTrainerConfig:
    """Hyperparameters (defaults = `configs/train/train_kubric_mrig.yaml`
    static trainer block)."""

    num_iterations: int = 20000
    position_lr_init: float = 0.00016
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 20000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    densification_interval: int = 100
    opacity_reset_interval: int = 5_000_000
    densify_from_iter: int = 500
    densify_until_iter: int = 20000
    densify_grad_threshold: float = 0.0002
    # The reference's screen-radius prune (big_points_vs) is a dead path
    # (max_radii2D is zeroed before densify_and_prune reads it); True opts
    # into the intended behavior. See train/densify.py module docstring.
    apply_screen_size_prune: bool = False
    # camera optimizer (None-like lrs of 0 disable movement, not the machinery)
    camera_rotation_lr: float = 1e-5
    camera_translation_lr: float = 1e-6
    camera_lr_warmup: int = 0
    camera_total_steps: int = 20000
    # pose-first warmup (framework extra, no reference counterpart): zero
    # every SCENE learning rate for the first `scene_lr_delay` iterations so
    # large pose-init errors are corrected photometrically before the scene
    # can absorb them (the densify/color race bakes pose error into geometry
    # otherwise). Camera LRs are NOT gated. 0 = off.
    scene_lr_delay: int = 0
    # frame-masked camera Adam (framework extra): freeze the moments/step
    # counts of pose rows whose frame is not in the batch, so round-robin
    # frame sampling behaves like an independent Adam per camera (see
    # optim.sparse_row_adam_update). Off = reference-exact shared-tensor
    # Adam semantics.
    camera_sparse_adam: bool = False
    # model
    sh_degree: int = 3
    isotropic: bool = False
    # render
    image_width: int = 256
    image_height: int = 256
    max_fragments: int | None = None


class FrameBatch(NamedTuple):
    """One training view (device arrays; H/W static via config)."""

    gt_image: jnp.ndarray              # [H, W, 3]
    gt_depth: jnp.ndarray | None       # [H, W]
    motion_mask: jnp.ndarray | None    # [H, W]
    frame_idx: jnp.ndarray             # [] int32 — selects the pose row
    time: jnp.ndarray                  # [] float
    fovx: jnp.ndarray                  # [] float
    fovy: jnp.ndarray                  # [] float


class StaticTrainState(NamedTuple):
    store: G.GaussianStore
    opt: AdamState                     # over GaussianParams
    stats: DensifyStats
    poses: CameraPoses
    cam_opt: AdamState


def init_static_state(store: G.GaussianStore, poses: CameraPoses,
                      camera_sparse_adam: bool = False) -> StaticTrainState:
    from .optim import sparse_row_adam_init
    return StaticTrainState(
        store=store,
        opt=adam_init(store.params),
        stats=init_stats(G.capacity_of(store)),
        poses=poses,
        cam_opt=(sparse_row_adam_init(poses, poses.q_c2w.shape[0])
                 if camera_sparse_adam else adam_init(poses)),
    )


def make_camera_from_poses(poses: CameraPoses, batch: FrameBatch) -> Camera:
    return Camera(
        q_c2w=poses.q_c2w[batch.frame_idx],
        t_c2w=poses.t_c2w[batch.frame_idx],
        fovx=batch.fovx,
        fovy=batch.fovy,
        time=batch.time,
    )


def _param_lr_tree(cfg: StaticTrainerConfig, iteration, spatial_lr_scale: float):
    """The six named param-group LRs (`optim_setup`), xyz on its schedule.
    All gated by the pose-first warmup (`scene_lr_delay`)."""
    xyz_lr = expon_lr(
        iteration,
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )
    gate = scene_lr_gate(cfg, iteration)
    return G.GaussianParams(
        xyz=xyz_lr * gate,
        features_dc=cfg.feature_lr * gate,
        features_rest=cfg.feature_lr / 20.0 * gate,
        scaling=cfg.scaling_lr * gate,
        rotation=cfg.rotation_lr * gate,
        opacity=cfg.opacity_lr * gate,
    )


def scene_lr_gate(cfg: StaticTrainerConfig, iteration):
    """0.0 during the pose-first warmup, 1.0 after (traced-safe)."""
    if cfg.scene_lr_delay <= 0:
        return 1.0
    return jnp.where(iteration <= cfg.scene_lr_delay, 0.0, 1.0)


class EscalationPoller:
    """Demand-driven fragment-capacity escalation AND shrinking, with
    DEFERRED host reads.

    On a poll iteration, acting on the just-enqueued step's overflow flag
    would block until that step completes — flushing the async dispatch
    pipeline (~30 ms, DESIGN.md). Instead the poller stores the metrics and
    acts on the snapshot saved at the PREVIOUS poll: one poll interval old,
    so its device work has long finished and the read returns immediately.
    The first poll after init (or after an escalation, which invalidates the
    stale snapshot) reads the current metrics synchronously, so single-poll
    escalation still works; steady state never stalls. Worst-case detection
    lag is two poll intervals, during which overflowing steps keep running
    with the exact dropped-fragment count reported.

    Shrinking: every fragment-scale op scales with the static capacity, so
    when the observed demand sits far below it (converged scenes on the
    "lean" 6N tier, or after early-training blobs shrink) the poller
    re-jits DOWN to `fit_capacity` (structural floor + 1.25x demand on the
    CAP_GRID_STEP geometric grid). Guards against thrash: steady state only
    (iteration > 100), the fit must be at least one full grid step below
    the current capacity, and TWO consecutive polls must agree (the larger
    of their fits wins). Escalation always takes precedence.

    Initial demand fit: the FIRST due poll (iteration 5) may shrink
    immediately, bypassing the steady-state guards. Trainers start on the
    "lean" 6N ladder tier, but the very first step already reports exact
    demand — when that fit sits a full grid step below the tier, waiting
    for the iteration>100 hysteresis pays the oversized sort/expand/
    segsum/compositing extent for hundreds of iterations (measured on the
    1080p flagship run: both stages sat on lean ~2x their fitted capacity
    for 345 of 400 iterations). Demand typically GROWS early (densify,
    opacity still high), so an under-fit self-corrects through the normal
    overflow escalation path at the next 5-iteration poll.
    """

    def __init__(self, allow_shrink: bool = True):
        self._probe = None
        self._shrink_fit = None
        self._bands_pending = None
        self._initial_fit_pending = True
        self.allow_shrink = allow_shrink

    def _fit_with_bands(self, capacity: int, demand: int):
        """Joint (fit capacity, bands) choice: the b=1 fit's 1.25x demand
        margin already absorbs a banded structural floor worth up to 10%
        of demand (bands_decision's upgrade margin requires exactly that),
        so the fit is NOT re-inflated for the floor — the band count is
        simply the largest the fitted capacity supports with upgrade-grade
        headroom."""
        fit = fit_capacity(capacity, demand)
        return fit, bands_decision(capacity, fit, demand)

    def poll(self, iteration: int, metrics: dict, capacity: int,
             profile):
        """Returns the new fragment profile to re-jit with, or None.
        Profiles are ladder names, explicit integer capacities, or
        (profile, bands) tuples carrying a sort-band count
        (compact.split_profile)."""
        if not escalation_poll_due(iteration):
            return None
        probe = self._probe if self._probe is not None else metrics
        self._probe = metrics
        prof, bands = split_profile(profile)
        cur = fragment_capacity(capacity, prof)
        demand = int(probe["num_fragments"])
        if bool(probe["overflow"]):
            self._shrink_fit = None
            self._bands_pending = None
            self._initial_fit_pending = False
            # a banded overflow whose real demand still fits the total
            # extent is a band-imbalance artifact: drop bands before
            # growing capacity
            if bands > 1:
                for b in range(bands - 1, 0, -1):
                    if bands_viable(capacity, cur, demand, b):
                        self._probe = None
                        return join_profile(prof, b)
            wider = profile_for_demand(capacity, demand, prof, bands=bands)
            if wider is None:
                return None
            self._probe = None
            wcap = fragment_capacity(capacity, wider)
            return join_profile(wider,
                                bands_decision(capacity, wcap, demand))
        if not self.allow_shrink:
            return None
        fit, fit_bands = self._fit_with_bands(capacity, demand)
        if self._initial_fit_pending:
            # one-time immediate fit off the first observed step demand
            # (see class docstring); later polls keep the hysteresis.
            self._initial_fit_pending = False
            if fit * 5 // 4 <= cur:
                self._probe = None
                return join_profile(fit, fit_bands)
            return None
        if iteration <= 100:
            return None
        if fit * 5 // 4 <= cur:  # at least one grid step below: shrink
            prev_fit, self._shrink_fit = self._shrink_fit, fit
            if prev_fit is None:
                return None
            self._probe = None
            self._shrink_fit = None
            fit = max(fit, prev_fit)
            return join_profile(fit, bands_decision(capacity, fit, demand))
        self._shrink_fit = None
        # capacity is settled: adjust the band count alone. Downgrades are
        # immediate (the current band count no longer keeps even the 3%
        # imbalance margin — waiting risks overflow drops); upgrades need
        # the 10% headroom margin AND 2-poll agreement, so a marginal fit
        # can't oscillate overflow -> reduce -> re-upgrade.
        if not bands_viable(capacity, cur, demand, bands):
            self._probe = None
            self._bands_pending = None
            return join_profile(
                prof, bands_decision(capacity, cur, demand,
                                     margin=BAND_KEEP_MARGIN))
        want_b = bands_decision(capacity, cur, demand)
        if want_b <= bands:
            self._bands_pending = None
            return None
        prev, self._bands_pending = self._bands_pending, want_b
        if prev != want_b:
            return None
        self._probe = None
        self._bands_pending = None
        return join_profile(prof, want_b)


class ThreeDGSTrainer:
    """Host-side orchestration around the jitted step.

    The jit cache is keyed on (active-set, sh_degree): each distinct loss
    gating pattern and SH ramp stage compiles once.
    """

    def __init__(self, cfg: StaticTrainerConfig, loss: MultiLoss,
                 store: G.GaussianStore, poses: CameraPoses,
                 spatial_lr_scale: float, mesh=None):
        self.cfg = cfg
        self.loss = loss
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("gauss", 1) > 1:
            # round-robin the alive slots so per-shard densification starts
            # balanced (parallel/sharded.make_sharded_densify docstring)
            store = G.shard_interleave(store, mesh.shape["gauss"])
        self.state = init_static_state(
            store, poses, camera_sparse_adam=cfg.camera_sparse_adam)
        self.active_sh_degree = 0
        # fragment capacity preset; escalated from observed demand (one
        # re-jit per tier) when a step reports binning overflow
        self.fragment_profile: str | int = "lean"
        self._escalation = EscalationPoller()
        if mesh is None:
            self._step_fn = functools.partial(
                jax.jit, static_argnames=("active", "sh_degree",
                                          "fragment_profile"))(self._step_impl)
            self._densify_fn = jax.jit(self._densify_impl,
                                       static_argnames=("max_screen_size",))
        else:
            # multi-device: same call signatures, batches stacked B-leading
            # over the mesh's data axis (pipelines/build.TrainingRun stacks)
            from ..parallel.sharded import (make_sharded_densify,
                                            make_sharded_static_step)
            self._step_fn = make_sharded_static_step(
                cfg, loss, mesh, self.spatial_lr_scale)
            self._densify_fn = make_sharded_densify(
                cfg, mesh, self.spatial_lr_scale)

    # --- jitted bodies ----------------------------------------------------

    def _render_ctx(self, params: G.GaussianParams, alive, poses, offset,
                    batch: FrameBatch, sh_degree: int,
                    fragment_profile: str = "lean"):
        cfg = self.cfg
        camera = make_camera_from_poses(poses, batch)
        xyz = params.xyz
        shs = G.get_features(params)
        opacity = G.get_opacity(params)
        scaling = G.get_scaling(params, cfg.isotropic)
        out = render(
            xyz, shs, opacity, scaling, params.rotation, camera,
            sh_degree, cfg.image_width, cfg.image_height,
            alive=alive, means2d_offset=offset,
            max_fragments=cfg.max_fragments,
            fragment_profile=fragment_profile,
            include_normal=self.loss.uses_normal,
        )
        return out, camera

    def _step_impl(self, state: StaticTrainState, batch: FrameBatch,
                   rng, iteration, active, sh_degree: int,
                   fragment_profile: str = "lean"):
        cfg = self.cfg

        def loss_fn(params, poses, offset):
            out, _ = self._render_ctx(params, state.store.alive, poses,
                                      offset, batch, sh_degree,
                                      fragment_profile)
            ctx = {
                "pred_img": out["rendered_image"],
                "gt_img": batch.gt_image,
                "pred_depth": out["rendered_depth"],
                "gt_depth": batch.gt_depth,
                "pred_normal": out["rendered_normal"],
                "motion_mask": batch.motion_mask,
                "alive": state.store.alive,
                "rng": rng,
            }
            total, loss_dict = self.loss(ctx, active)
            aux = {
                "radii": out["radii"],
                "visible": out["visibility_filter"],
                "loss_dict": loss_dict,
                "overflow": out["overflow"],
                "dropped": out["dropped"],
                "num_fragments": out["num_fragments"],
            }
            return total, aux

        offset0 = jnp.zeros((2, G.capacity_of(state.store)), jnp.float32)
        (total, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                                 has_aux=True)(
            state.store.params, state.poses, offset0)
        g_params, g_poses, g_offset = grads

        lr_tree = _param_lr_tree(cfg, iteration, self.spatial_lr_scale)
        # pose-first warmup: freeze the scene Adam ENTIRELY (moments +
        # count, not just LRs) so warmup-phase grads against uncorrected
        # poses never contaminate post-gate updates (ADVICE r4)
        gate = scene_lr_gate(cfg, iteration)
        new_params, new_opt = adam_update(
            g_params, state.opt, state.store.params, lr_tree,
            update_gate=gate if cfg.scene_lr_delay > 0 else None)

        cam_lrs = camera_lr_tree(
            iteration, cfg.camera_rotation_lr, cfg.camera_translation_lr,
            cfg.camera_lr_warmup, cfg.camera_total_steps)
        if cfg.camera_sparse_adam:
            # frame-masked Adam: only this batch's pose row advances (see
            # optim.sparse_row_adam_update — recovers per-camera step sizes
            # under round-robin frame sampling)
            from .optim import sparse_row_adam_update
            n_f = state.poses.q_c2w.shape[0]
            row_mask = (jnp.arange(n_f, dtype=jnp.int32)
                        == batch.frame_idx.astype(jnp.int32))
            new_poses, new_cam_opt = sparse_row_adam_update(
                g_poses, state.cam_opt, state.poses, cam_lrs, row_mask)
        else:
            new_poses, new_cam_opt = adam_update(
                g_poses, state.cam_opt, state.poses, cam_lrs)

        new_stats = accumulate_stats(
            state.stats, g_offset, aux["radii"].astype(jnp.float32),
            aux["visible"])
        if cfg.scene_lr_delay > 0:
            # densify stats from the frozen-scene warmup would bias the
            # first post-gate densify decisions — gate them too (ADVICE r4)
            new_stats = jax.tree.map(
                lambda n, o: jnp.where(
                    jnp.asarray(gate, jnp.float32) > 0.0, n, o),
                new_stats, state.stats)

        new_state = StaticTrainState(
            store=state.store._replace(params=new_params),
            opt=new_opt,
            stats=new_stats,
            poses=new_poses,
            cam_opt=new_cam_opt,
        )
        metrics = {"loss": total, "overflow": aux["overflow"],
                   "dropped": aux["dropped"],
                   "num_fragments": aux["num_fragments"],
                   **aux["loss_dict"]}
        return new_state, metrics

    def _densify_impl(self, state: StaticTrainState, key,
                      max_screen_size):
        cfg = self.cfg
        aux = {
            "mu_params": state.opt.mu,
            "nu_params": state.opt.nu,
        }
        new_store, new_aux, new_stats, info = densify_and_prune(
            state.store, aux, state.stats, key,
            max_grad=cfg.densify_grad_threshold,
            min_opacity=0.005,
            extent=self.spatial_lr_scale,
            percent_dense=cfg.percent_dense,
            max_screen_size=max_screen_size,
            isotropic=cfg.isotropic,
            apply_screen_size_prune=cfg.apply_screen_size_prune,
        )
        new_opt = AdamState(mu=new_aux["mu_params"], nu=new_aux["nu_params"],
                            count=state.opt.count)
        return state._replace(store=new_store, opt=new_opt,
                              stats=new_stats), info

    # --- host API ---------------------------------------------------------

    def maybe_ramp_sh(self, iteration: int, start: int = 0, period: int = 1000):
        """`oneupSHdegree` on its schedule. The standalone static trainer
        ramps every 1000 iters from 0 (`rodygs_static.py:372-373`); the joint
        trainer passes its own (start, period)."""
        if iteration > start and iteration % period == 0:
            self.active_sh_degree = G.sh_degree_up(
                self.active_sh_degree, self.cfg.sh_degree)

    def train_iteration(self, batch: FrameBatch, iteration: int, rng) -> dict:
        active = self.loss.active_set(iteration)
        self.state, metrics = self._step_fn(
            self.state, batch, rng, jnp.asarray(iteration, jnp.float32),
            active=active, sh_degree=self.active_sh_degree,
            fragment_profile=self.fragment_profile)
        # Overflow escalation: polls every 5 iters early / 25 at steady
        # state, acting on the previous poll's snapshot (EscalationPoller)
        # so the read never stalls the dispatch pipeline. The new capacity
        # is sized from the OBSERVED demand (one re-jit jumps straight to a
        # fitting tier — a ladder profile, or an explicit 1.5x-grid
        # capacity when demand exceeds the 24N "huge" tier); past the 2^24
        # cap, dropped-fragment counts keep being reported so capacity
        # clipping is never silent (VERDICT r1 #8).
        wider = self._escalation.poll(
            iteration, metrics, G.capacity_of(self.state.store),
            self.fragment_profile)
        if wider is not None:
            self.fragment_profile = wider

        cfg = self.cfg
        info = None
        if iteration < cfg.densify_until_iter:
            if (cfg.densification_interval != 0
                    and iteration > cfg.densify_from_iter
                    and iteration % cfg.densification_interval == 0):
                size_threshold = (
                    20.0 if iteration > cfg.opacity_reset_interval else None)
                key = jax.random.fold_in(rng, 1)
                self.state, info = self._densify_fn(
                    self.state, key, max_screen_size=size_threshold)
            if (cfg.opacity_reset_interval != 0
                    and iteration % cfg.opacity_reset_interval == 0):
                store, mu_op, nu_op = reset_opacity(
                    self.state.store, self.state.opt.mu.opacity,
                    self.state.opt.nu.opacity)
                self.state = self.state._replace(
                    store=store,
                    opt=self.state.opt._replace(
                        mu=self.state.opt.mu._replace(opacity=mu_op),
                        nu=self.state.opt.nu._replace(opacity=nu_op)))
        if info is not None:
            metrics["densify"] = info
        return metrics

    def state_dict(self, iteration: int) -> dict[str, Any]:
        """Checkpoint payload (shape of `rodygs_static.py:321-347`)."""
        return {
            "iteration": iteration,
            "active_sh_degree": self.active_sh_degree,
            "model": G.to_state_dict(self.state.store),
            "optim": {
                "max_radii2D": self.state.stats.max_radii2d,
                "xyz_gradient_accum": self.state.stats.grad_accum,
                "denom": self.state.stats.denom,
                "adam": self.state.opt,
            },
            "camera": {
                "q_c2w": self.state.poses.q_c2w,
                "t_c2w": self.state.poses.t_c2w,
            },
            "spatial_lr_scale": self.spatial_lr_scale,
        }
