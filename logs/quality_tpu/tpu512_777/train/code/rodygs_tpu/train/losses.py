"""Training losses — jittable pure functions with the reference's MultiLoss
semantics.

Capability parity with `src/trainer/losses.py`:
  * MultiLoss: weighted sub-losses, each with `weight`, `freq` (apply every k
    iters), `start` iteration (`losses.py:25-75`).
  * SSIMLoss / L1Loss with static/dynamic motion-mask modes.
  * Global/Local Pearson depth losses (`losses.py:110-182`).
  * RigidityLoss: KNN-based `surface` / `coeff` / `distance_preserving`
    modes with Charbonnier truncation (`losses.py:185-360`), KNN over a
    random half of the Gaussians (pytorch3d -> ops/knn.py).
  * MotionL1Loss, MotionSparsityLoss, MotionBasisRegularizaiton with its
    16-entry frequency-weight coefficient banks (`losses.py:363-525`).

TPU-first design: `freq`/`start` gating is STATIC — the trainer asks
`active_set(iteration)` on the host and jits one step variant per distinct
active set (at most a handful), so an expensive loss like rigidity (KNN every
5 iters) costs nothing on the other iterations instead of being computed and
masked. Randomness (box sampling, Gaussian subsampling, timestep sampling)
flows through explicit jax PRNG keys. Images are channels-last [H, W, C].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import charbonnier_loss, l1_loss, pearson_depth_loss, ssim
from ..ops.knn import knn, knn_gather
from ..ops.quaternion import quat_to_matrix


def _safe_norm(x, axis=-1, eps=1e-12):
    """L2 norm with a NaN-free gradient at x=0 (torch special-cases the
    zero-vector norm backward; JAX does not — and KNN self-pairs make exact
    zero difference vectors routine here)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def _masked_pair(pred, gt, motion_mask, mode):
    """Apply the reference's static/dynamic mask-multiply semantics."""
    if motion_mask is None or mode in (None, "all"):
        return pred, gt
    m = motion_mask.astype(pred.dtype)
    if mode == "static":
        m = 1.0 - m
    if m.ndim == pred.ndim - 1:
        m = m[..., None]
    return pred * m, gt * m


def ssim_loss(ctx, mode=None, **_):
    p, g = _masked_pair(ctx["pred_img"], ctx["gt_img"], ctx.get("motion_mask"), mode)
    return 1.0 - ssim(p, g)


def l1_loss_fn(ctx, mode=None, **_):
    p, g = _masked_pair(ctx["pred_img"], ctx["gt_img"], ctx.get("motion_mask"), mode)
    return l1_loss(p, g)


def global_pearson_depth(ctx, mode=None, eps=1e-6, **_):
    mask = None
    mm = ctx.get("motion_mask")
    if mm is not None and mode in ("static", "dynamic"):
        mask = (1.0 - mm) if mode == "static" else mm
    return pearson_depth_loss(ctx["pred_depth"], ctx["gt_depth"], eps, mask)


def local_pearson_depth(ctx, box_p: int, p_corr: float, mode=None, eps=1e-6, **_):
    """Random-box Pearson depth loss (`LocalPearsonDepthLoss`,
    `losses.py:138-182`), vectorized: n_corr boxes gathered with a vmapped
    dynamic_slice instead of a host loop."""
    pred, gt = ctx["pred_depth"], ctx["gt_depth"]
    key = ctx["rng"]
    h, w = pred.shape
    num_box_h = h // box_p
    num_box_w = w // box_p
    n_corr = int(p_corr * num_box_h * num_box_w)
    if n_corr == 0:
        return jnp.zeros(())
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (n_corr,), 0, max(h - box_p, 1))
    y0 = jax.random.randint(ky, (n_corr,), 0, max(w - box_p, 1))

    def one_box(x, y):
        pb = jax.lax.dynamic_slice(pred, (x, y), (box_p, box_p))
        gb = jax.lax.dynamic_slice(gt, (x, y), (box_p, box_p))
        return pearson_depth_loss(pb, gb, eps)

    losses = jax.vmap(one_box)(x0, y0)
    return jnp.sum(losses) / n_corr


def motion_l1(ctx, **_):
    """mean |motion_coeff| over alive Gaussians (`MotionL1Loss`)."""
    coeff = ctx["motion_coeff"]  # [C, 1, B]
    alive = ctx["alive"].astype(coeff.dtype)
    denom = jnp.maximum(jnp.sum(alive), 1.0) * coeff.shape[1] * coeff.shape[2]
    return jnp.sum(jnp.abs(coeff) * alive[:, None, None]) / denom


def motion_sparsity(ctx, **_):
    """max-normalized |coeff| mean (`MotionSparsityLoss`, `losses.py:369-377`)."""
    coeff = ctx["motion_coeff"]
    alive = ctx["alive"].astype(coeff.dtype)
    a = jnp.abs(coeff)
    mx = jnp.max(a, axis=2, keepdims=True)
    normalized = a / (mx + 1e-7)
    denom = jnp.maximum(jnp.sum(alive), 1.0) * coeff.shape[1] * coeff.shape[2]
    return jnp.sum(normalized * alive[:, None, None]) / denom


def rigidity(ctx, scale: float = 2.0, K: int = 8, sim_metric: str = "l2",
             dist_weight_lambda: float = 0.1, color_sim: bool = True,
             dist_preserving_ratio: int = 4, mode: Sequence[str] = ("coeff",),
             **_):
    """KNN rigidity regularizer (`RigidityLoss`, `losses.py:185-360`).

    Static sample size C//scale with alive-mask validity (the reference
    samples exactly N*1/scale of a dynamically-sized set; fixed capacity makes
    the sample size static — invalid picks are masked out of every mean).
    """
    xyz = ctx["canon_xyz"]                 # [C, 3] canonical positions
    transl = ctx["pred_translation"]       # [C, 3] current deformation
    coeff = ctx["motion_coeff"][:, 0, :]   # [C, B]
    colors = ctx["features_dc"][:, 0, :]   # [C, 3]
    alive = ctx["alive"]
    key = ctx["rng"]
    c = xyz.shape[0]
    s = max(int(c / scale), K + 1)

    k1, k2 = jax.random.split(key)
    perm = jax.random.permutation(k1, c)
    # prefer alive slots: stable sort pushes dead ones to the back
    order = jnp.argsort(jnp.where(alive[perm], 0, 1), stable=True)
    idx = perm[order][:s]
    valid = alive[idx]

    pts = xyz[idx] + transl[idx]
    # KNN discovers neighbor INDICES only (stop-gradient): autodiff through
    # the blocked-knn lax.scan would stack every block's [S, B] distance
    # matrix as residuals — 64 GiB at flagship capacity (S=131072, 32
    # blocks). The K squared distances are recomputed below from gathered
    # positions, differentiably, at O(S*K) memory; same values as the knn
    # output up to fp association (the dot-product identity vs the direct
    # difference).
    pts_ng = jax.lax.stop_gradient(pts)
    _, nn_idx = knn(pts_ng, pts_ng, k=K, valid_mask=valid)
    nn_pts = knn_gather(pts, nn_idx)  # [S, K, 3]
    dists = jnp.sum((pts[:, None, :] - nn_pts) ** 2, axis=-1)  # [S, K]
    dists = jnp.where(valid[:, None], dists, 0.0)
    vcount = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    total = jnp.zeros(())

    if "surface" in mode:
        mean_nn = jnp.mean(nn_pts, axis=1)
        d = _safe_norm(pts - mean_nn, axis=1)
        total = total + jnp.sum(jnp.where(valid, d, 0.0)) / vcount

    if "coeff" in mode:
        coeff_s = coeff[idx]
        coeff_nn = knn_gather(coeff_s, nn_idx)          # [S, K, B]
        color_s = colors[idx]
        color_nn = knn_gather(color_s, nn_idx)          # [S, K, 3]
        color_d = _safe_norm(color_s[:, None] - color_nn)
        dist_w = jnp.exp(-dist_weight_lambda * dists**2)
        color_w = jnp.exp(-dist_weight_lambda * color_d**2)
        if sim_metric == "l2":
            sim = _safe_norm(coeff_s[:, None] - coeff_nn)
        elif sim_metric == "l1":
            sim = jnp.sum(jnp.abs(coeff_s[:, None] - coeff_nn), axis=-1)
        else:  # cosine
            num = jnp.sum(coeff_s[:, None] * coeff_nn, axis=-1)
            den = (jnp.linalg.norm(coeff_s, axis=-1)[:, None]
                   * jnp.linalg.norm(coeff_nn, axis=-1) + 1e-8)
            sim = num / den
        sim = (color_w * dist_w * sim) if color_sim else (dist_w * sim)
        total = total + jnp.sum(jnp.where(valid[:, None], sim, 0.0)) / (vcount * K)

    if "distance_preserving" in mode:
        table = ctx["motion_table"]  # [T, B, 7]
        num_t = table.shape[0]
        n_samp = max(num_t // dist_preserving_ratio, 1)
        tsel = jax.random.randint(k2, (n_samp,), 0, max(num_t - 1, 1))
        transl_basis = table[tsel][..., :3]  # [Ts, B, 3]
        coeff_s = coeff[idx]  # [S, B]
        # per-sampled-Gaussian translation at each sampled time: [S, Ts, 3]
        transl_t = jnp.einsum("sb,tbk->stk", coeff_s, transl_basis)
        nn_transl = knn_gather(transl_t, nn_idx)  # [S, K, Ts, 3]
        canon_s = xyz[idx]
        nn_canon = knn_gather(canon_s, nn_idx)    # [S, K, 3]
        loc_nn = nn_transl + nn_canon[:, :, None, :]        # [S, K, Ts, 3]
        loc_s = transl_t + canon_s[:, None, :]              # [S, Ts, 3]
        diff = loc_nn - loc_s[:, None, :, :]
        d_t = _safe_norm(diff)                              # [S, K, Ts]
        valid_w = (valid[:, None, None]).astype(jnp.float32)
        # Charbonnier between time-varying and canonical KNN distances,
        # out_norm="bc" over a [S*K, Ts, 1]-shaped comparison.
        x = (d_t * valid_w).transpose(0, 1, 2).reshape(-1, n_samp, 1)
        y = (dists[:, :, None] * valid_w).reshape(-1, 1, 1)
        y = jnp.broadcast_to(y, x.shape)
        total = total + charbonnier_loss(x, y, out_norm="bc")

    return total


# 16-entry frequency-weight banks (`MotionBasisRegularizaiton.coeff_bank`).
_COEFF_BANK = {
    "gaussian": [2.368737348178644, 2.3218332060968687, 2.186620166400238,
                 1.9785357455909518, 1.7200563444604107, 1.4367118264767467,
                 1.1529882480025957, 0.8890134170352768, 0.6585973377702478,
                 0.4687700396753248, 0.3205737399288996, 0.2106319563365025,
                 0.13296850925636292, 0.08064947764026723, 0.04699834214974086,
                 0.026314295000921823],
    "sigmoid": [0.0, 0.006057306357564347, 0.019407599012746118,
                0.04848852855754725, 0.11024831053568876, 0.23462085565239668,
                0.4602813915432914, 0.8016437593070956, 1.1983562406929047,
                1.539718608456709, 1.7653791443476032, 1.889751689464311,
                1.9515114714424528, 1.9805924009872535, 1.9939426936424351, 2.0],
    "laplacian": [3.0235547043507864, 2.475477220065594, 2.0267493286116927,
                  1.6593620041145454, 1.3585707032576908, 1.112303614987853,
                  0.910677176350366, 0.7455994104042655, 0.6104451667747834,
                  0.49979023110633275, 0.40919363229470634, 0.3350194107233597,
                  0.274290694437278, 0.22457022681891523, 0.18386255092234366,
                  0.15053392477948924],
    "cum_exponential": [0.24858106424723717, 0.45210202617930384,
                        0.6187308966091, 0.7551550771806206, 0.8668497492779882,
                        0.9582976122790642, 1.0331687900213073,
                        1.0944681257580495, 1.1446557770689725,
                        1.1857459506219796, 1.219387739359138,
                        1.246931306386802, 1.2694820717618154,
                        1.2879450768797849, 1.3030613069641026,
                        1.3154374294047362],
    "vanilla": [1.0] * 16,
}


def motion_basis_reg(ctx, transl_degree: int = 0, rot_degree: int = 0,
                     freq_div_mode: str = "vanilla",
                     apply_rot_matmul_derivative: bool = False, **_):
    """Velocity/acceleration smoothness of the motion basis over the full
    motion table, frequency-weighted per basis
    (`MotionBasisRegularizaiton.forward`, `losses.py:488-525`).

    Faithful-behavior note (quirk reproduced by default): the reference's
    `derivate_motion` never passes `is_rot=True`, so the relative-rotation
    matmul branch at `losses.py:483-485` is dead code and the rotation
    "derivative" is elementwise matrix subtraction `R[t+1] - R[t]` — for
    degree 0 that makes `||I - dR||_F` hover near sqrt(3) with only small
    gradient terms. `apply_rot_matmul_derivative=True` opts into the
    intended math (`dR = R[t+1] @ R[t]^T`, identity when motion is rigid
    over time)."""
    table = ctx["motion_table"]  # [T, B, 7]
    # Degree-d derivatives need at least d+2 timesteps; with fewer the
    # difference arrays are empty and their mean is NaN.
    if table.shape[0] < max(transl_degree, rot_degree) + 2:
        return jnp.zeros(())
    bank = np.asarray(_COEFF_BANK[freq_div_mode], np.float32)
    if freq_div_mode != "vanilla":
        bank = bank / bank.max() * 1.3
    reg_coeff = jnp.asarray(bank)[: table.shape[1]]

    transl = table[..., :3]  # [T, B, 3]
    rotq = table[..., 3:]
    t, b = rotq.shape[:2]
    # The basis rot outputs are tiny deltas around zero; eps=1e-8 keeps the
    # 2/|q|^2 backward finite on TPU (see quat_to_matrix docstring).
    rotm = quat_to_matrix(rotq.reshape(-1, 4), eps=1e-8).reshape(t, b, 3, 3)

    def deriv(x, degree):
        for _ in range(degree + 1):
            x = x[1:] - x[:-1]
        return x

    def rot_deriv_once(r):
        if apply_rot_matmul_derivative:
            return jnp.einsum("tbij,tbkj->tbik", r[1:], r[:-1])
        return r[1:] - r[:-1]  # faithful: reference's dead `is_rot` branch

    transl_d = deriv(transl, transl_degree)
    rot_d = rotm
    for _ in range(rot_degree + 1):
        rot_d = rot_deriv_once(rot_d)

    transl_norm = _safe_norm(transl_d) * reg_coeff[None]
    out = jnp.mean(transl_norm) if transl_degree >= 0 else 0.0
    eye = jnp.eye(3)
    rot_norm = _safe_norm(
        (eye[None, None] - rot_d).reshape(*rot_d.shape[:2], 9)
    ) * reg_coeff[None]
    out = out + (jnp.mean(rot_norm) if rot_degree >= 0 else 0.0)
    return out


_LOSS_REGISTRY: dict[str, Callable] = {
    "SSIMLoss": ssim_loss,
    "L1Loss": l1_loss_fn,
    "GlobalPearsonDepthLoss": global_pearson_depth,
    "LocalPearsonDepthLoss": local_pearson_depth,
    "MotionL1Loss": motion_l1,
    "MotionSparsityLoss": motion_sparsity,
    "RigidityLoss": rigidity,
    "MotionBasisRegularizaiton": motion_basis_reg,   # (sic — reference name)
    "MotionBasisRegularization": motion_basis_reg,
}


@dataclasses.dataclass(frozen=True)
class LossTerm:
    name: str
    weight: float
    fn_name: str
    freq: int = 1
    start: int = 0
    params: tuple = ()  # tuple of (key, value) pairs — hashable for jit

    def is_active(self, iteration: int) -> bool:
        return iteration % self.freq == 0 and iteration > self.start


class MultiLoss:
    """Weighted sum of sub-losses with freq/start gating.

    `active_set(iteration)` is computed on the host; `__call__` takes the
    active set as a static tuple so each distinct gating pattern compiles
    exactly one step variant.
    """

    def __init__(self, terms: Sequence[LossTerm]):
        self.terms = tuple(terms)

    @classmethod
    def from_config(cls, loss_configs: Sequence[dict]) -> "MultiLoss":
        """Build from the reference's YAML list-of-dicts shape
        ({name, weight, freq, start, target, params})."""
        terms = []
        for cfg in loss_configs:
            target = cfg["target"].rsplit(".", 1)[-1]
            params = tuple(sorted(
                (k, tuple(v) if isinstance(v, (list, tuple)) else v)
                for k, v in dict(cfg.get("params") or {}).items()))
            terms.append(LossTerm(
                name=cfg["name"], weight=float(cfg["weight"]),
                fn_name=target, freq=int(cfg.get("freq", 1)),
                start=int(cfg.get("start", 0)), params=params))
        return cls(terms)

    def active_set(self, iteration: int) -> tuple[bool, ...]:
        return tuple(t.is_active(iteration) for t in self.terms)

    @property
    def uses_normal(self) -> bool:
        """Whether any term reads ctx["pred_normal"]. No registered loss
        does (the reference composites normals it never supervises); a
        future normal-supervision loss must add its fn_name here so the
        renderer keeps the normal rows in the fragment sort."""
        normal_losses: set[str] = set()
        return any(t.fn_name in normal_losses for t in self.terms)

    def __call__(self, ctx: dict[str, Any], active: tuple[bool, ...]):
        total = jnp.zeros(())
        loss_dict = {}
        keys = jax.random.split(ctx.get("rng", jax.random.key(0)),
                                max(len(self.terms), 1))
        for i, (term, on) in enumerate(zip(self.terms, active)):
            if not on:
                continue
            fn = _LOSS_REGISTRY[term.fn_name]
            sub_ctx = dict(ctx)
            sub_ctx["rng"] = keys[i]
            val = fn(sub_ctx, **dict(term.params))
            loss_dict[term.name] = val
            total = total + term.weight * val
        return total, loss_dict
