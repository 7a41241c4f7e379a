"""LPIPS perceptual distance in pure JAX (AlexNet / VGG16 backbones).

Behavior parity with the reference's local LPIPS implementation
(`src/utils/eval_utils.py:120-285`), which builds torchvision backbones and
downloads the richzhang v0.1 linear-head weights at runtime. Conventions
pinned by that implementation (cross-checked against a torch transliteration
in tests/test_eval.py::TestLpipsParity):

  * inputs are [0, 1] images z-scored directly with the richzhang
    shift/scale constants — the reference does NOT rescale to [-1, 1]
    first (`eval_utils.py:37-42,193-194` feed clipped [0,1] tensors), a
    deviation from official richzhang LPIPS that we reproduce for parity;
  * AlexNet pooling is torchvision's MaxPool2d(kernel=3, stride=2); VGG16
    pooling is MaxPool2d(2, 2);
  * feature normalization is `x / (||x||_2 + 1e-10)` (eps added to the
    norm, not under the sqrt — `eval_utils.py:240-242`);
  * per-layer head: 1x1 conv (raw weights, no bias) -> spatial mean ->
    sum over the 5 tap layers.

This environment has no network egress and no pretrained caches, so:

  * the full forward is implemented here in jnp,
  * weights are loaded from a local `.npz` (converted once from the torch
    checkpoints with `scripts/convert_lpips_weights.py`), path given
    explicitly or via `RODYGS_LPIPS_WEIGHTS`,
  * with no weights available, `lpips_fn` returns None and callers omit
    the metric (with a one-time warning) rather than reporting NaN or
    silently wrong numbers.
"""

from __future__ import annotations

import os
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, kernel, stride, pad) per conv; pool placed BEFORE the
# listed conv indices; which conv outputs (post-relu) feed LPIPS heads.
_ALEX_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1)]
_ALEX_POOL_BEFORE = {1, 2}  # torchvision alexnet: MaxPool2d(3, stride=2)
_ALEX_TAPS = [0, 1, 2, 3, 4]

_VGG_CONVS = [(64, 3, 1, 1), (64, 3, 1, 1),
              (128, 3, 1, 1), (128, 3, 1, 1),
              (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1),
              (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
              (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1)]
_VGG_POOL_BEFORE = {2, 4, 7, 10}  # MaxPool2d(2, 2)
_VGG_TAPS = [1, 3, 6, 9, 12]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3


def _maxpool(x, k: int, s: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID")


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _features(net: str, params: dict, x: jnp.ndarray):
    convs = _ALEX_CONVS if net == "alex" else _VGG_CONVS
    pools = _ALEX_POOL_BEFORE if net == "alex" else _VGG_POOL_BEFORE
    pool_k, pool_s = (3, 2) if net == "alex" else (2, 2)
    taps = _ALEX_TAPS if net == "alex" else _VGG_TAPS
    feats = []
    for i, (_, _, stride, pad) in enumerate(convs):
        if i in pools:
            x = _maxpool(x, pool_k, pool_s)
        x = _conv(x, params[f"conv{i}/w"], params[f"conv{i}/b"], stride, pad)
        x = jax.nn.relu(x)
        if i in taps:
            feats.append(x)
    return feats


def _lpips_forward(net: str, params: dict, img1: jnp.ndarray,
                   img2: jnp.ndarray) -> jnp.ndarray:
    """img1/img2: [H, W, 3] in [0, 1] (reference convention: z-score the
    [0,1] image directly; no [-1,1] rescale)."""
    shift = params["shift"]  # [3]
    scale = params["scale"]  # [3]

    def prep(im):
        im = jnp.clip(im, 0.0, 1.0)
        im = (im - shift[None, None]) / scale[None, None]
        return im.transpose(2, 0, 1)[None]  # [1, 3, H, W]

    f1 = _features(net, params, prep(img1))
    f2 = _features(net, params, prep(img2))
    total = jnp.zeros(())
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        lin = params[f"lin{i}/w"]  # [C] 1x1-conv head weights
        total = total + jnp.mean(jnp.sum(d * lin[None, :, None, None], axis=1))
    return total


_warned = set()


def lpips_fn(net: str = "alex", weights_path: str | None = None):
    """Returns a callable (gt [H,W,3], pred [H,W,3]) -> scalar distance, or
    None (with a one-time warning) if weights are unavailable — callers
    omit the metric in that case."""
    path = weights_path or os.environ.get("RODYGS_LPIPS_WEIGHTS")
    params = None
    if path and os.path.exists(path):
        raw = np.load(path)
        prefix = f"{net}/"
        params = {k[len(prefix):]: jnp.asarray(v) for k, v in raw.items()
                  if k.startswith(prefix)}
        for common in ("shift", "scale"):
            if common in raw:
                params[common] = jnp.asarray(raw[common])
        if not any(k.startswith("conv") for k in params):
            params = None

    if params is None:
        if net not in _warned:
            _warned.add(net)
            warnings.warn(
                f"LPIPS({net}) weights unavailable (no network egress; "
                "set RODYGS_LPIPS_WEIGHTS to a converted .npz) — "
                "the lpips metric will be omitted.")
        return None

    fwd = jax.jit(partial(_lpips_forward, net, params))
    return lambda img1, img2: fwd(jnp.asarray(img1), jnp.asarray(img2))
