"""Image quality metrics: PSNR / SSIM / MS-SSIM / DSSIM / LPIPS.

Capability parity with `VizScoreEvaluator` (`src/utils/eval_utils.py:26-53`),
which uses piqa + a local LPIPS. Implemented natively in jnp
(channels-last [H, W, C] images in [0, 1]):

  * PSNR, SSIM — shared with the training losses (ops/image.py); eval SSIM
    uses VALID-window convolution like piqa (the training loss keeps the
    reference trainer's zero-padded SAME conv).
  * MS-SSIM — standard 5-scale Wang et al. weights with 2x avg-pool
    downsampling (piqa-compatible).
  * LPIPS — see lpips.py: full AlexNet/VGG feature-distance implementation;
    requires a weights file (no network egress in this environment); the
    lpipsa/lpipsv keys are omitted when weights are absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import _gaussian_window, psnr
from .lpips import lpips_fn

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _blur_valid(img: jnp.ndarray, window_size: int = 11,
                sigma: float = 1.5) -> jnp.ndarray:
    """Separable Gaussian blur with VALID padding, [H, W, C]."""
    w = jnp.asarray(_gaussian_window(window_size, sigma))
    x = img.transpose(2, 0, 1)[:, None]
    kh = w.reshape(1, 1, window_size, 1)
    kw = w.reshape(1, 1, 1, window_size)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[:, 0].transpose(1, 2, 0)


def _ssim_cs(img1: jnp.ndarray, img2: jnp.ndarray,
             window_size: int = 11, sigma: float = 1.5):
    """Returns (mean luminance*cs term, mean cs term) — VALID windows."""
    blur = lambda x: _blur_valid(x, window_size, sigma)
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    c1, c2 = 0.01**2, 0.03**2
    cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map), jnp.mean(cs_map)


def ssim_eval(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return _ssim_cs(img1, img2)[0]


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x average pool with reflect-pad to even dims, [H, W, C]."""
    h, w = img.shape[:2]
    img = jnp.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    return img.reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3))


def ms_ssim_levels(height: int, width: int) -> int:
    """Scale count the adaptive MS-SSIM uses for an image of these dims:
    each level needs the 11-tap window to fit after the 2x downsamplings.
    Below 5 levels the msssim/dssim values are NOT piqa-comparable (piqa's
    fixed-5-scale form is NaN there) — the evaluator flags this in
    result.yaml."""
    min_dim = min(height, width)
    levels = 1
    while levels < len(_MSSSIM_WEIGHTS) and (min_dim >> levels) >= 11:
        levels += 1
    return levels


def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """MS-SSIM (Wang et al. 2003), piqa-compatible 5-scale weights.

    The scale count adapts to the image: each level needs the 11-tap window
    to fit after the 2x downsamplings (the fixed-5-scale form is NaN below
    176 px; small validation crops are legitimate inputs here). Weights are
    renormalized over the retained scales."""
    levels = ms_ssim_levels(img1.shape[0], img1.shape[1])
    weights = np.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / weights.sum()
    mcs = []
    val = None
    for i in range(levels):
        ssim_val, cs = _ssim_cs(img1, img2)
        if i == levels - 1:
            val = jnp.maximum(ssim_val, 0.0)
        else:
            mcs.append(jnp.maximum(cs, 0.0))
            img1 = _downsample2(img1)
            img2 = _downsample2(img2)
    out = val ** weights[-1]
    for w, cs in zip(weights[:-1], mcs):
        out = out * cs**w
    return out


class VizScoreEvaluator:
    """psnr / ssim / msssim / dssim / lpips(alex+vgg) per image pair
    (`eval_utils.py:33-53`)."""

    def __init__(self, lpips_weights: str | None = None):
        self._lpips_alex = lpips_fn("alex", lpips_weights)
        self._lpips_vgg = lpips_fn("vgg", lpips_weights)
        self._jit_core = jax.jit(self._core)

    def _core(self, gt, pred):
        gt = jnp.clip(gt, 0.0, 1.0)
        pred = jnp.clip(pred, 0.0, 1.0)
        msssim = ms_ssim(gt, pred)
        return {
            "psnr": psnr(pred, gt),
            "ssim": ssim_eval(gt, pred),
            "msssim": msssim,
            "dssim": (1.0 - msssim) / 2.0,
        }

    def get_score(self, gt_image, pred_image) -> dict[str, float]:
        out = {k: float(v) for k, v in self._jit_core(
            jnp.asarray(gt_image), jnp.asarray(pred_image)).items()}
        # lpips keys appear only when weights are available (lpips.py)
        if self._lpips_alex is not None:
            out["lpipsa"] = float(self._lpips_alex(gt_image, pred_image))
        if self._lpips_vgg is not None:
            out["lpipsv"] = float(self._lpips_vgg(gt_image, pred_image))
        return out
