"""Dynamic (motion-basis) Gaussian trainer.

Capability parity with `DynTrainer` (`src/trainer/rodygs_dynamic.py`): the
static trainer plus `deform_network` + `motion_coeff` param groups, motion
carried through densification (clone/split/prune move coefficients with their
Gaussians), checkpoint extras.

Faithful-behavior note (SURVEY.md §7): the reference builds an exponential
deform-LR schedule but its `update_learning_rate` matches group name
"deform" while the group is registered as "deform_network" — the decay NEVER
applies and the deform LR stays at `deform_lr_init` for the whole run
(`rodygs_dynamic.py:101-112,199-215`). We reproduce that (constant deform LR)
and expose `apply_deform_lr_decay=True` to opt into the evidently-intended
schedule.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models import motion as M
from ..ops.schedules import expon_lr
from ..render.rasterize import render
from .densify import accumulate_stats, densify_and_prune, init_stats
from .losses import MultiLoss
from .optim import AdamState, CameraPoses, adam_init, adam_update
from .trainer_static import (
    FrameBatch,
    StaticTrainerConfig,
    ThreeDGSTrainer,
    _param_lr_tree,
    make_camera_from_poses,
)


@dataclasses.dataclass(frozen=True)
class DynTrainerConfig(StaticTrainerConfig):
    """Adds the DyNMF params (kubric_mrig dynamic-trainer defaults)."""

    deform_lr_init: float = 0.0016
    deform_lr_final: float = 0.00016
    deform_lr_delay_mult: float = 0.01
    deform_lr_max_steps: int = 20000
    motion_coeff_lr: float = 0.00016
    deform_warmup_steps: int = 0
    apply_deform_lr_decay: bool = False  # reference bug: decay never applies
    # model
    deform_netwidth: int = 128
    deform_t_emb_multires: int = 26
    deform_t_log_sampling: bool = False
    num_basis: int = 16
    inverse_motion: bool = True
    activation: str = "gelu"


class DynParams(NamedTuple):
    """All trainable leaves of the dynamic model."""

    gauss: G.GaussianParams
    motion_coeff: jnp.ndarray  # [C, 1, B]
    net: dict                  # motion-basis MLP params


class DynTrainState(NamedTuple):
    store: G.GaussianStore
    motion_coeff: jnp.ndarray
    net: dict
    opt: AdamState     # over DynParams
    stats: Any


class DynTrainer:
    """Host orchestration for the dynamic model. Rendering happens in the
    joint trainer (concatenated with the static set); this class owns the
    dynamic state, its optimizer/LRs, and its densification."""

    def __init__(self, cfg: DynTrainerConfig, loss: MultiLoss,
                 store: G.GaussianStore, spatial_lr_scale: float,
                 rng: jax.Array, mesh=None):
        self.cfg = cfg
        self.loss = loss
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("gauss", 1) > 1:
            # balance alive slots over the gauss shards so per-shard
            # densification starts even (make_sharded_densify docstring)
            store = G.shard_interleave(store, mesh.shape["gauss"])
        self.net_cfg = M.MotionNetConfig(
            netwidth=cfg.deform_netwidth,
            num_basis=cfg.num_basis,
            t_emb_multires=cfg.deform_t_emb_multires,
            t_log_sampling=cfg.deform_t_log_sampling,
            activation=cfg.activation,
        )
        cap = G.capacity_of(store)
        net = M.init_motion_params(rng, self.net_cfg)
        coeff = jnp.zeros((cap, 1, cfg.num_basis), jnp.float32)
        params = DynParams(gauss=store.params, motion_coeff=coeff, net=net)
        self.state = DynTrainState(
            store=store, motion_coeff=coeff, net=net,
            opt=adam_init(params), stats=init_stats(cap))
        self.active_sh_degree = 0
        # Unique birth timesteps — static table for inverse-motion
        # canonicalization (`sync_gaussian_to_time_ind` consumer).
        self.unique_times = jnp.asarray(G.unique_times(store), jnp.float32)
        if mesh is None:
            self._densify_fn = jax.jit(self._densify_impl,
                                       static_argnames=("max_screen_size",))
        else:
            # densify each gauss shard's slice locally (VERDICT r3 #6)
            from ..parallel.sharded import make_sharded_dynamic_densify
            self._densify_fn = make_sharded_dynamic_densify(
                cfg, mesh, self.spatial_lr_scale)

    # --- pieces used by the joint trainer's jitted step --------------------

    def params(self) -> DynParams:
        return DynParams(gauss=self.state.store.params,
                         motion_coeff=self.state.motion_coeff,
                         net=self.state.net)

    def lr_tree(self, iteration) -> DynParams:
        cfg = self.cfg
        gauss = _param_lr_tree(cfg, iteration, self.spatial_lr_scale)
        if cfg.apply_deform_lr_decay:
            deform_lr = expon_lr(
                iteration, cfg.deform_lr_init, cfg.deform_lr_final,
                lr_delay_mult=cfg.deform_lr_delay_mult,
                max_steps=cfg.deform_lr_max_steps)
        else:
            deform_lr = cfg.deform_lr_init
        from .trainer_static import scene_lr_gate
        gate = scene_lr_gate(cfg, iteration)  # pose-first warmup
        net_lrs = jax.tree.map(lambda _: deform_lr * gate, self.state.net)
        return DynParams(gauss=gauss,
                         motion_coeff=cfg.motion_coeff_lr * gate,
                         net=net_lrs)

    def deformation(self, params: DynParams, t, time_ind):
        return M.gaussian_deformation(
            params.net, self.net_cfg, params.motion_coeff, t,
            self.spatial_lr_scale, inverse_motion=self.cfg.inverse_motion,
            time_ind=time_ind, times_table=self.unique_times)

    def motion_table(self, params: DynParams):
        return M.motion_table(params.net, self.net_cfg, self.unique_times)

    # --- densification -----------------------------------------------------

    def _densify_impl(self, state: DynTrainState, key, max_screen_size):
        cfg = self.cfg
        aux = {
            "mu_params": state.opt.mu.gauss,
            "nu_params": state.opt.nu.gauss,
            "coeff": state.motion_coeff,
            "mu_coeff": state.opt.mu.motion_coeff,
            "nu_coeff": state.opt.nu.motion_coeff,
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
        new_opt = AdamState(
            mu=DynParams(gauss=new_aux["mu_params"],
                         motion_coeff=new_aux["mu_coeff"],
                         net=state.opt.mu.net),
            nu=DynParams(gauss=new_aux["nu_params"],
                         motion_coeff=new_aux["nu_coeff"],
                         net=state.opt.nu.net),
            count=state.opt.count,
        )
        return state._replace(store=new_store, motion_coeff=new_aux["coeff"],
                              opt=new_opt, stats=new_stats), info

    def maybe_densify(self, iteration: int, rng) -> Any:
        cfg = self.cfg
        if iteration >= cfg.densify_until_iter:
            return None
        if (cfg.densification_interval != 0
                and iteration > cfg.densify_from_iter
                and iteration % cfg.densification_interval == 0):
            size_threshold = (
                20.0 if iteration > cfg.opacity_reset_interval else None)
            self.state, info = self._densify_fn(
                self.state, rng, max_screen_size=size_threshold)
            return info
        return None

    def state_dict(self, iteration: int) -> dict[str, Any]:
        sd = {
            "iteration": iteration,
            "active_sh_degree": self.active_sh_degree,
            "model": G.to_state_dict(self.state.store),
            "optim": {"adam": self.state.opt,
                      "stats": self.state.stats},
            "spatial_lr_scale": self.spatial_lr_scale,
        }
        sd["model"]["_motion_coeff"] = self.state.motion_coeff
        sd["model"]["_deform_network"] = self.state.net
        sd["model"]["_timestep"] = self.state.store.time
        return sd
