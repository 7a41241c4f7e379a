"""Low-rank motion model: time-conditioned basis MLP + per-Gaussian
coefficients.

Capability parity with `TimestepEmbedder` / `MLPMotionBasis` /
`MLPBasisNetwork` (`src/model/rodygs_dynamic.py:190-327`): sin/cos Fourier
time embedding (26 freqs, include-input, linear or log-spaced), a 3-layer
timenet (width W, GELU), and B per-basis 2-layer heads producing
(translation 3 + rotation-quaternion 4) each; deformation =
`motion_coeff @ basis`.

TPU-first: the B separate head MLPs of the reference become two batched
weight tensors (`[B, W/2 -> 7]`) evaluated with one einsum — a single MXU
contraction instead of a Python loop over 16 modules. Matmuls run in
bfloat16-friendly shapes but fp32 accumulation (model is tiny; accuracy wins).
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class MotionNetConfig(NamedTuple):
    netwidth: int = 128
    num_basis: int = 16
    t_emb_multires: int = 26
    t_log_sampling: bool = False
    activation: str = "gelu"

    @property
    def t_embed_dim(self) -> int:
        return self.t_emb_multires * 2 + 1


def embed_time(t: jnp.ndarray, multires: int, log_sampling: bool) -> jnp.ndarray:
    """[...]-shaped timesteps -> [..., 2*multires+1] Fourier features.
    Order matches the reference: [t, sin(t f1), cos(t f1), sin(t f2), ...]."""
    t = jnp.asarray(t, jnp.float32)
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (multires - 1), multires)
    freqs = freqs * math.pi
    tf = t[..., None] * freqs  # [..., M]
    sincos = jnp.stack([jnp.sin(tf), jnp.cos(tf)], axis=-1).reshape(
        *t.shape, 2 * multires)
    return jnp.concatenate([t[..., None], sincos], axis=-1)


def init_motion_params(key: jax.Array, cfg: MotionNetConfig) -> dict[str, Any]:
    """Normal(0, 1e-2) weights, zero biases (reference init,
    `rodygs_dynamic.py:233-238,290-293`)."""
    w = cfg.netwidth
    b = cfg.num_basis
    d = cfg.t_embed_dim
    ks = jax.random.split(key, 5)
    std = 1e-2
    return {
        "timenet": {
            "w0": jax.random.normal(ks[0], (d, w)) * std,
            "b0": jnp.zeros((w,)),
            "w1": jax.random.normal(ks[1], (w, w)) * std,
            "b1": jnp.zeros((w,)),
            "w2": jax.random.normal(ks[2], (w, w // 2)) * std,
            "b2": jnp.zeros((w // 2,)),
        },
        "heads": {
            # B per-basis 2-layer MLPs, batched over dim 0.
            "w0": jax.random.normal(ks[3], (b, w // 2, w // 4)) * std,
            "b0": jnp.zeros((b, w // 4)),
            "w1": jax.random.normal(ks[4], (b, w // 4, 7)) * std,
            "b1": jnp.zeros((b, 7)),
        },
    }


def _act(cfg: MotionNetConfig):
    if cfg.activation.lower() == "relu":
        return jax.nn.relu
    # exact (erf) GELU: torch's nn.GELU() default, which the reference uses
    # — jax.nn.gelu defaults to the tanh approximation (≈3e-4 relative off)
    return functools.partial(jax.nn.gelu, approximate=False)


def basis_from_embedding(params: dict, cfg: MotionNetConfig,
                         t_emb: jnp.ndarray) -> jnp.ndarray:
    """[..., t_embed_dim] -> [..., B, 7] motion bases
    (the reference's `batch_inference`)."""
    act = _act(cfg)
    tn = params["timenet"]
    h = act(t_emb @ tn["w0"] + tn["b0"])
    h = act(h @ tn["w1"] + tn["b1"])
    h = act(h @ tn["w2"] + tn["b2"])  # [..., W/2]
    hd = params["heads"]
    # one batched contraction for all B heads
    g = act(jnp.einsum("...i,bij->...bj", h, hd["w0"]) + hd["b0"])
    return jnp.einsum("...bj,bjk->...bk", g, hd["w1"]) + hd["b1"]  # [..., B, 7]


def motion_basis(params: dict, cfg: MotionNetConfig, t) -> jnp.ndarray:
    """Scalar (or batched) time -> [B, 7] basis."""
    emb = embed_time(jnp.asarray(t), cfg.t_emb_multires, cfg.t_log_sampling)
    return basis_from_embedding(params, cfg, emb)


def apply_coefficients(motion_coeff: jnp.ndarray, basis: jnp.ndarray):
    """[N, 1, B] coeffs x [B, 7] basis -> (translation [N,3], rot-delta [N,4]).
    (`MLPBasisNetwork.forward`, `rodygs_dynamic.py:308-327`.)"""
    tot = jnp.einsum("nb,bk->nk", motion_coeff[:, 0, :], basis)
    return tot[:, :3], tot[:, 3:]


def motion_table(params: dict, cfg: MotionNetConfig,
                 times: jnp.ndarray) -> jnp.ndarray:
    """[T] unique timesteps -> [T, B, 7] motion table (the reference's
    `get_total_motion_table`, recomputed per step and cached within the step;
    here it is just a value inside the jitted step — XLA CSEs reuse)."""
    return motion_basis(params, cfg, times)


def gaussian_deformation(
    params: dict,
    cfg: MotionNetConfig,
    motion_coeff: jnp.ndarray,
    t,
    spatial_lr_scale: float,
    inverse_motion: bool = False,
    time_ind: jnp.ndarray | None = None,
    times_table: jnp.ndarray | None = None,
):
    """Per-Gaussian deformation at time `t` (`get_gaussian_deformation`,
    `rodygs_dynamic.py:122-138`): translation scaled by spatial_lr_scale;
    with `inverse_motion`, each Gaussian's birth-time motion is subtracted
    (canonicalization)."""
    basis = motion_basis(params, cfg, t)  # [B, 7]
    translation, rotation = apply_coefficients(motion_coeff, basis)
    if inverse_motion:
        assert time_ind is not None and times_table is not None
        table = motion_table(params, cfg, times_table)  # [T, B, 7]
        birth = table[time_ind]  # [N, B, 7]
        delta = jnp.einsum("nb,nbk->nk", motion_coeff[:, 0, :], birth)
        translation = translation - delta[:, :3]
        rotation = rotation - delta[:, 3:]
    return translation * spatial_lr_scale, rotation
