"""Joint static+dynamic trainer — the top of the training stack.

Capability parity with `RoDyGSTrainer` (`src/trainer/rodygs.py:24-369`):
per iteration (1) a static step optimizing static Gaussians + camera poses,
(2) a dynamic step rendering the CONCATENATED static+deformed-dynamic set but
optimizing only the dynamic model, (3) SH-degree sync between the two models
on the `sh_up_start_iteration/sh_up_period` schedule, (4) densification on
each model's own slice of the screen-space gradients, (5) end-of-run
checkpoints `static_last.ckpt` / `dynamic_last.ckpt`.

Design divergence (documented): the reference keeps two pose arrays and
copies static->dynamic every iteration (`rodygs.py:165-174`); since the
dynamic stage's camera LRs are 0.0 in every shipped config, this framework
SHARES one pose array owned by the static trainer — the dynamic step reads it
through a stop_gradient. Identical trajectories, half the state.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp

from ..models import gaussians as G
from ..render.rasterize import render
from .densify import accumulate_stats
from .optim import adam_update
from .trainer_dynamic import DynParams, DynTrainer
from .trainer_static import (EscalationPoller, FrameBatch, ThreeDGSTrainer,
                             make_camera_from_poses)


class RoDyGSTrainer:
    def __init__(self, static_trainer: ThreeDGSTrainer,
                 dynamic_trainer: DynTrainer | None,
                 sh_up_start_iteration: int = 0,
                 sh_up_period: int = 1000,
                 log_freq: int = 50,
                 logdir: str | Path | None = None,
                 mesh=None):
        self.static = static_trainer
        self.dynamic = dynamic_trainer
        self.skip_dynamic = dynamic_trainer is None
        self.sh_up_start_iteration = sh_up_start_iteration
        self.sh_up_period = sh_up_period
        self.log_freq = log_freq
        self.logdir = Path(logdir) if logdir is not None else None
        if not self.skip_dynamic:
            self.dyn_fragment_profile = "lean"
            self._dyn_escalation = EscalationPoller()
            if mesh is None:
                self._dyn_step = functools.partial(
                    jax.jit,
                    static_argnames=("active", "sh_degree", "use_deform",
                                     "fragment_profile")
                )(self._dyn_step_impl)
            else:
                # multi-device: dynamic batches stacked over the data axis;
                # the static store stays SHARDED over "gauss" (only
                # projected records move, via the render's record
                # all_gather); the dynamic store is replicated with its
                # per-device slice entering the composite
                from ..parallel.sharded import make_sharded_dynamic_step
                self._dyn_step = make_sharded_dynamic_step(
                    self.dynamic, self.dynamic.cfg, self.dynamic.loss, mesh)

    # --- dynamic step (renders concat static+dynamic, trains dynamic) ------

    def _dyn_step_impl(self, dyn_state, static_store, poses, batch: FrameBatch,
                       rng, iteration, active, sh_degree: int,
                       use_deform: bool, fragment_profile: str = "lean"):
        dyn = self.dynamic
        cfg = dyn.cfg
        sp = jax.lax.stop_gradient(static_store.params)
        s_alive = static_store.alive
        cs = G.capacity_of(static_store)
        cd = G.capacity_of(dyn_state.store)
        poses = jax.lax.stop_gradient(poses)  # dynamic-stage camera LRs are 0

        def loss_fn(params: DynParams, offset):
            gp = params.gauss
            if use_deform:
                transl, rot_delta = dyn.deformation(
                    params, batch.time, dyn_state.store.time_ind)
            else:
                transl = jnp.zeros_like(gp.xyz)
                rot_delta = jnp.zeros((cd, 4), jnp.float32)
            d_alive = dyn_state.store.alive

            # concat static + deformed dynamic (`get_GS_properties`,
            # `rodygs.py:68-113`)
            xyz = jnp.concatenate([sp.xyz, gp.xyz + transl], axis=0)
            opacity = jnp.concatenate(
                [G.get_opacity(sp), G.get_opacity(gp)], axis=0)
            scaling = jnp.concatenate(
                [G.get_scaling(sp, cfg.isotropic),
                 G.get_scaling(gp, cfg.isotropic)], axis=0)
            if cfg.isotropic:
                dyn_rot = G.get_rotation(gp)
            else:
                dyn_rot = G.get_rotation(gp) + rot_delta
            rotation = jnp.concatenate([G.get_rotation(sp), dyn_rot], axis=0)
            features = jnp.concatenate(
                [G.get_features(sp), G.get_features(gp)], axis=0)
            alive = jnp.concatenate([s_alive, d_alive], axis=0)

            camera = make_camera_from_poses(poses, batch)
            out = render(
                xyz, features, opacity, scaling, rotation, camera,
                sh_degree, cfg.image_width, cfg.image_height,
                alive=alive, means2d_offset=offset,
                max_fragments=cfg.max_fragments,
                fragment_profile=fragment_profile,
                include_normal=self.dynamic.loss.uses_normal,
            )
            ctx = {
                "pred_img": out["rendered_image"],
                "gt_img": batch.gt_image,
                "pred_depth": out["rendered_depth"],
                "gt_depth": batch.gt_depth,
                "pred_normal": out["rendered_normal"],
                "motion_mask": batch.motion_mask,
                "rng": rng,
                # model-term inputs (dynamic slice)
                "motion_coeff": params.motion_coeff,
                "canon_xyz": gp.xyz,
                "features_dc": gp.features_dc,
                "pred_translation": transl,
                "alive": d_alive,
                "motion_table": dyn.motion_table(params),
            }
            total, loss_dict = self.dynamic.loss(ctx, active)
            aux = {
                "radii": out["radii"][cs:],
                "visible": out["visibility_filter"][cs:],
                "loss_dict": loss_dict,
                "overflow": out["overflow"],
                "dropped": out["dropped"],
                "num_fragments": out["num_fragments"],
            }
            return total, aux

        params = DynParams(gauss=dyn_state.store.params,
                           motion_coeff=dyn_state.motion_coeff,
                           net=dyn_state.net)
        offset0 = jnp.zeros((2, cs + cd), jnp.float32)
        (total, aux), (g_params, g_offset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offset0)

        from .trainer_static import scene_lr_gate
        d_gate = scene_lr_gate(cfg, iteration)
        new_params, new_opt = adam_update(
            g_params, dyn_state.opt, params, dyn.lr_tree(iteration),
            update_gate=d_gate if cfg.scene_lr_delay > 0 else None)
        new_stats = accumulate_stats(
            dyn_state.stats, g_offset[:, cs:],
            aux["radii"].astype(jnp.float32), aux["visible"])

        new_state = dyn_state._replace(
            store=dyn_state.store._replace(params=new_params.gauss),
            motion_coeff=new_params.motion_coeff,
            net=new_params.net,
            opt=new_opt,
            stats=new_stats,
        )
        metrics = {"loss": total, "overflow": aux["overflow"],
                   "dropped": aux["dropped"],
                   "num_fragments": aux["num_fragments"],
                   **aux["loss_dict"]}
        return new_state, metrics

    # --- host loop ---------------------------------------------------------

    def train_iteration(self, static_batch: FrameBatch,
                        dynamic_batch: FrameBatch | None,
                        iteration: int, rng) -> dict[str, Any]:
        # SH ramp on the joint schedule (`rodygs.py:215-231`), applied to the
        # static model then mirrored to the dynamic one.
        if (iteration > self.sh_up_start_iteration
                and iteration % self.sh_up_period == 0):
            self.static.active_sh_degree = G.sh_degree_up(
                self.static.active_sh_degree, self.static.cfg.sh_degree)
        metrics = {}

        k_static, k_dyn, k_dens = jax.random.split(rng, 3)
        active = self.static.loss.active_set(iteration)
        self.static.state, m_static = self.static._step_fn(
            self.static.state, static_batch, k_static,
            jnp.asarray(iteration, jnp.float32),
            active=active, sh_degree=self.static.active_sh_degree,
            fragment_profile=self.static.fragment_profile)
        metrics["static"] = m_static
        wider = self.static._escalation.poll(
            iteration, m_static, G.capacity_of(self.static.state.store),
            self.static.fragment_profile)
        if wider is not None:
            self.static.fragment_profile = wider

        # static densification on its own schedule
        cfg_s = self.static.cfg
        if iteration < cfg_s.densify_until_iter:
            if (cfg_s.densification_interval != 0
                    and iteration > cfg_s.densify_from_iter
                    and iteration % cfg_s.densification_interval == 0):
                st = 20.0 if iteration > cfg_s.opacity_reset_interval else None
                self.static.state, info = self.static._densify_fn(
                    self.static.state, k_dens, max_screen_size=st)
                metrics["static_densify"] = info

        if not self.skip_dynamic:
            self.dynamic.active_sh_degree = self.static.active_sh_degree
            active_d = self.dynamic.loss.active_set(iteration)
            use_deform = iteration > self.dynamic.cfg.deform_warmup_steps
            self.dynamic.state, m_dyn = self._dyn_step(
                self.dynamic.state, self.static.state.store,
                self.static.state.poses, dynamic_batch, k_dyn,
                jnp.asarray(iteration, jnp.float32),
                active=active_d, sh_degree=self.dynamic.active_sh_degree,
                use_deform=use_deform,
                fragment_profile=self.dyn_fragment_profile)
            metrics["dynamic"] = m_dyn
            # the dynamic stage renders the CONCATENATED static+dynamic
            # set; capacity is sized against the combined store
            wider = self._dyn_escalation.poll(
                iteration, m_dyn,
                G.capacity_of(self.static.state.store)
                + G.capacity_of(self.dynamic.state.store),
                self.dyn_fragment_profile)
            if wider is not None:
                self.dyn_fragment_profile = wider
            info = self.dynamic.maybe_densify(
                iteration, jax.random.fold_in(k_dens, 1))
            if info is not None:
                metrics["dynamic_densify"] = info

        return metrics

    def save_checkpoints(self, iteration: int):
        from ..parallel.multihost import barrier, is_primary
        from ..utils.checkpoint import save_checkpoint

        # multi-host: exactly one writer per logdir; every process then
        # barriers so no reader can race the primary's os.replace
        if is_primary():
            assert self.logdir is not None
            self.logdir.mkdir(parents=True, exist_ok=True)
            save_checkpoint(self.logdir / "static_last.ckpt",
                            self.static.state_dict(iteration), iteration)
            if not self.skip_dynamic:
                save_checkpoint(self.logdir / "dynamic_last.ckpt",
                                self.dynamic.state_dict(iteration), iteration)
        barrier("rodygs_ckpt")

    # --- mid-training resume (new capability: the reference checkpoints only
    # at the END of training and has no resume path — SURVEY.md §5.4) -------

    def save_resume(self, path, iteration: int, key):
        from ..parallel.multihost import barrier, is_primary
        from ..utils.checkpoint import save_checkpoint

        # multi-host: exactly one writer per logdir; the trailing barrier
        # makes save_resume a sync point so a subsequent load_resume on ANY
        # process sees the completed file (round-4 regression: a
        # non-primary raced ahead, hit FileNotFoundError, and the primary
        # hung in the next collective)
        if is_primary():
            payload = {
                "iteration": iteration,
                "rng_key": jax.random.key_data(key),
                "static": {"state": self.static.state,
                           "sh": self.static.active_sh_degree},
            }
            if not self.skip_dynamic:
                payload["dynamic"] = {
                    "state": self.dynamic.state,
                    "sh": self.dynamic.active_sh_degree,
                    "unique_times": self.dynamic.unique_times}
            save_checkpoint(path, payload, iteration)
        barrier("rodygs_ckpt")

    def load_resume(self, path):
        """Restore trainer state; returns (next_iteration, rng_key).

        Multi-host: callers must reach this on every process (gate the
        decision through `multihost.broadcast_flag` when it depends on a
        filesystem check); the bounded `wait_for_path` covers shared-FS
        visibility lag behind the primary's write."""
        from ..parallel.multihost import wait_for_path
        from ..utils.checkpoint import load_checkpoint

        wait_for_path(path)
        payload, iteration = load_checkpoint(path)

        def as_jnp(tree):
            return jax.tree.map(jnp.asarray, tree)

        self.static.state = jax.tree.unflatten(
            jax.tree.structure(self.static.state),
            jax.tree.leaves(as_jnp(payload["static"]["state"])))
        self.static.active_sh_degree = int(payload["static"]["sh"])
        if not self.skip_dynamic and "dynamic" in payload:
            self.dynamic.state = jax.tree.unflatten(
                jax.tree.structure(self.dynamic.state),
                jax.tree.leaves(as_jnp(payload["dynamic"]["state"])))
            self.dynamic.active_sh_degree = int(payload["dynamic"]["sh"])
            self.dynamic.unique_times = jnp.asarray(
                payload["dynamic"]["unique_times"])
        key = jax.random.wrap_key_data(jnp.asarray(payload["rng_key"]))
        return iteration + 1, key
