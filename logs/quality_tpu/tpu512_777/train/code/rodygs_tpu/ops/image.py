"""Image-space loss math: L1/L2, windowed SSIM, Pearson depth correlation,
Charbonnier. Pure jnp, channels-last `[H, W, C]` images (TPU lane layout).

Capability parity with `src/utils/loss_utils.py:57-117,235-249` of the
reference (which is channels-first torch). SSIM uses the same 11-tap sigma-1.5
separable Gaussian window and constants C1=0.01^2, C2=0.03^2. The separable
blur is expressed as two banded-matrix matmuls (one per image axis) instead
of `lax.conv`: XLA lowers 1/3-channel 2D convs to a degenerate `T(1,128)`
layout costing ~23 ms/step at 512^2 on v5e, while the same arithmetic as
[H,H] x [H, W*C] matmuls rides the MXU in well under a millisecond (and its
VJP is just the transposed matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """[n, n] banded matrix B with B[i, i+k-pad] = w[k]: `B @ x` is the SAME
    zero-padded 1-D window conv along a length-n axis."""
    w = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    b = np.zeros((n, n), np.float32)
    for k in range(window_size):
        off = k - pad
        idx = np.arange(max(0, -off), min(n, n - off))
        b[idx, idx + off] += w[k]
    return b


def _blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of [H, W, C] with SAME (zero) padding, as two
    banded matmuls (MXU) — see module docstring."""
    h, w_, _ = img.shape
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    bw = jnp.asarray(_band_matrix(w_, window_size, sigma))
    x = jnp.einsum("ij,jwc->iwc", bh, img)    # blur along H
    return jnp.einsum("vw,iwc->ivc", bw, x)   # blur along W


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM of two [H, W, C] images; identical formula to the reference's
    window-conv `ssim` (`loss_utils.py:57-97`), including its zero-padded
    borders."""
    if img1.ndim == 2:
        img1 = img1[:, :, None]
    if img2.ndim == 2:
        img2 = img2[:, :, None]
    c = img1.shape[2]
    # one stacked blur: all five windowed moments share the two matmuls
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=2)
    b = _blur(stacked, window_size, sigma)
    mu1, mu2 = b[:, :, 0:c], b[:, :, c:2 * c]
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = b[:, :, 2 * c:3 * c] - mu1_sq
    sigma2_sq = b[:, :, 3 * c:4 * c] - mu2_sq
    sigma12 = b[:, :, 4 * c:5 * c] - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def pearson_depth_loss(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-6,
                       mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """1 - Pearson correlation of flattened depths (`loss_utils.py:100-117`).

    Matches the reference exactly, including its mask semantics: the mask
    multiplies (zeroes) masked-out entries but the mean/std are still taken
    over ALL entries — a faithful-behavior choice, not a bug fix.
    """
    p = pred.reshape(-1)
    g = gt.reshape(-1)
    if mask is not None:
        m = mask.reshape(-1).astype(p.dtype)
        p = p * m
        g = g * m
    pc = p - jnp.mean(p)
    gc = g - jnp.mean(g)
    # torch .std() uses the unbiased (n-1) estimator; match it.
    n = p.shape[0]
    bessel = jnp.sqrt(n / jnp.maximum(n - 1.0, 1.0))
    pn = pc / (jnp.std(pc) * bessel + eps)
    gn = gc / (jnp.std(gc) * bessel + eps)
    return 1.0 - jnp.mean(pn * gn)


def charbonnier_loss(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-6,
                     out_norm: str = "bc") -> jnp.ndarray:
    """Charbonnier (smooth L1), normalized per the reference's `out_norm`
    string semantics (`loss_utils.py:207-249`): 'b' divides by dim0,
    'c' by dim1, 'i' by the last two dims."""
    loss = jnp.sum(jnp.sqrt((x - y) ** 2 + eps**2))
    norm = 1.0
    shape = x.shape
    if "b" in out_norm:
        norm /= shape[0]
    if "c" in out_norm:
        norm /= shape[1]
    if "i" in out_norm:
        norm /= shape[-1] * shape[-2]
    return loss * norm
