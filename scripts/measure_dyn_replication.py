"""Measure the cost of the work the dynamic stage REPLICATES per device
under a gauss-sharded mesh (VERDICT r3 #6): the motion-MLP deformation
(forward + backward over the full capacity) and the dynamic-store Adam
update. Everything else in the dynamic step — the render, the compositing,
and (since r4) the densification — is sharded.

Runs on the single TPU chip at flagship capacity (default 262144 = the
1080p run's 2x-headroom store) and prints the replicated-work time next to
the measured flagship joint-iteration time, giving the documented bound
"replication costs X ms = Y% of the joint step per device".

Method note: this is an isolated-jit timing, which DESIGN.md warns
overstates costs vs fused in-step timings (no overlap, dispatch per call)
— fine for an upper bound.

Usage: python scripts/measure_dyn_replication.py [--capacity 262144]
       [--joint_ms 572]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(args):
    import jax
    import jax.numpy as jnp

    from rodygs_tpu.models import gaussians as G
    from rodygs_tpu.train.losses import LossTerm, MultiLoss
    from rodygs_tpu.train.optim import adam_init, adam_update
    from rodygs_tpu.train.trainer_dynamic import (DynParams, DynTrainer,
                                                  DynTrainerConfig)

    cap = args.capacity
    n = cap * 3 // 4
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    times = (rng.integers(0, 12, size=n) / 11).astype(np.float32)
    store = G.from_point_cloud(pts, cols, sh_degree=3, capacity=cap,
                               times=times)
    cfg = DynTrainerConfig(
        image_width=1920, image_height=1080, sh_degree=3,
        deform_netwidth=128, deform_t_emb_multires=26, num_basis=16,
        inverse_motion=True)
    loss = MultiLoss([LossTerm("l1", 1.0, "L1Loss")])
    dt = DynTrainer(cfg, loss, store, 5.0, jax.random.key(0))
    params = dt.params()

    def deform_loss(params, t):
        transl, rot_delta = dt.deformation(params, t, dt.state.store.time_ind)
        # surrogate cotangent so the FULL deformation backward runs
        return jnp.sum(transl * 1e-3) + jnp.sum(rot_delta * 1e-3)

    vg = jax.jit(jax.value_and_grad(deform_loss))
    opt0 = adam_init(params)
    lr = dt.lr_tree(jnp.asarray(1000.0))

    @jax.jit
    def adam_step(g, opt, params):
        return adam_update(g, opt, params, lr)

    t_val = jnp.asarray(0.37)
    _, g = vg(params, t_val)
    new_params, opt = adam_step(g, opt0, params)
    jax.block_until_ready(new_params.gauss.xyz)

    def timeit(fn, reps=30):
        wins = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(jax.tree.leaves(out)[0])
            wins.append((time.perf_counter() - t0) / reps * 1e3)
        return float(np.median(wins))

    ms_deform = timeit(lambda: vg(params, t_val))
    ms_adam = timeit(lambda: adam_step(g, opt0, params))
    total = ms_deform + ms_adam
    print(f"[dyn-replication] capacity={cap}: deformation fwd+bwd "
          f"{ms_deform:.2f} ms, dyn-store adam {ms_adam:.2f} ms, "
          f"total replicated {total:.2f} ms "
          f"= {total / args.joint_ms * 100:.1f}% of a {args.joint_ms:.0f} ms "
          f"flagship joint iteration (per device, upper bound)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--capacity", type=int, default=262144)
    p.add_argument("--joint_ms", type=float, default=572.0)
    main(p.parse_args())
