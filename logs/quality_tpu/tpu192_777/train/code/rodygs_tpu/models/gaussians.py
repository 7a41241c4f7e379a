"""Gaussian store: fixed-capacity dict-of-arrays pytree with alive masks.

Capability parity with `StaticRoDyGS` (`src/model/rodygs_static.py:33-296`):
raw parameters (`xyz`, `features_dc`, `features_rest`, log-`scaling`,
quaternion `rotation`, logit-`opacity`), activation properties, point-cloud
init (RGB2SH colors, KNN scale prior, opacity 0.1), SH-degree ramp,
per-Gaussian time tags.

TPU-first redesign: N changes every densification in the reference
(tensor reallocation + optimizer surgery). Here the store has a static
CAPACITY leading dimension plus an `alive` mask, so every train step —
including densify/prune — compiles once and runs under jit with static
shapes. Dead slots carry zeroed params; the renderer masks them via `alive`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import mean_knn_sqdist
from ..ops.quaternion import quat_normalize
from ..ops.sh import num_sh_coeffs, rgb2sh


class GaussianParams(NamedTuple):
    """Raw (pre-activation) parameters, leading dim = capacity."""

    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray        # [C, 3] log-scale ([C, 1] if isotropic)
    rotation: jnp.ndarray       # [C, 4] quaternion (w,x,y,z)
    opacity: jnp.ndarray        # [C, 1] logit


class GaussianStore(NamedTuple):
    params: GaussianParams
    alive: jnp.ndarray          # [C] bool
    time: jnp.ndarray           # [C] per-Gaussian birth timestamp
    time_ind: jnp.ndarray       # [C] int32 index into unique timesteps


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def shard_interleave(store: GaussianStore, n_shards: int) -> GaussianStore:
    """Permute capacity slots so alive Gaussians (packed at the front by
    `from_point_cloud`) spread round-robin over `n_shards` equal blocks —
    required before sharding the store over a "gauss" mesh axis, so every
    shard starts with ~n/S alive slots and ~equal densification headroom.
    Slot order is semantically free (it only breaks depth-sort ties)."""
    c = capacity_of(store)
    assert c % n_shards == 0, (c, n_shards)
    src = jnp.asarray(
        np.arange(c).reshape(c // n_shards, n_shards).T.reshape(-1))
    return jax.tree.map(lambda x: x[src], store)


def capacity_of(store: GaussianStore) -> int:
    return store.params.xyz.shape[0]


def num_alive(store: GaussianStore) -> jnp.ndarray:
    return jnp.sum(store.alive.astype(jnp.int32))


# --- activations (mirror the reference's get_* properties) -----------------

def get_scaling(params: GaussianParams, isotropic: bool = False) -> jnp.ndarray:
    s = jnp.exp(params.scaling)
    if isotropic:
        s = jnp.broadcast_to(s[:, :1], (s.shape[0], 3))
    return s


def get_rotation(params: GaussianParams) -> jnp.ndarray:
    return quat_normalize(params.rotation)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity[:, 0])


def get_features(params: GaussianParams) -> jnp.ndarray:
    """[C, K, 3] full SH coefficient stack."""
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


# --- construction ----------------------------------------------------------

def round_capacity(n: int, multiple: int = 256) -> int:
    return -(-n // multiple) * multiple


def from_point_cloud(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int,
    capacity: int | None = None,
    times: np.ndarray | None = None,
    isotropic: bool = False,
    capacity_factor: float = 4.0,
) -> GaussianStore:
    """Initialize from a point cloud (the `create_from_pcd` contract,
    `src/model/rodygs_static.py:116-172`):
      * DC SH from RGB2SH(color), higher bands zero,
      * log-scale from sqrt(mean 3-NN squared distance) (KNN replaces the
        `distCUDA2` CUDA kernel),
      * identity rotations, opacity sigmoid^-1(0.1),
      * capacity = capacity_factor * N (densification headroom).
    """
    n = points.shape[0]
    if capacity is None:
        capacity = round_capacity(int(n * capacity_factor))
    assert capacity >= n
    k = num_sh_coeffs(sh_degree)

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_knn_sqdist(pts, k=3), 1e-7)
    log_scale = 0.5 * jnp.log(dist2)  # log(sqrt(d2))

    pad = capacity - n

    def padded(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    scaling_cols = 1 if isotropic else 3
    params = GaussianParams(
        xyz=padded(pts),
        features_dc=padded(rgb2sh(jnp.asarray(colors, jnp.float32))[:, None, :]),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=padded(jnp.tile(log_scale[:, None], (1, scaling_cols))),
        rotation=padded(
            jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))),
        opacity=padded(jnp.full((n, 1), inverse_sigmoid(0.1), jnp.float32)),
    )
    alive = jnp.arange(capacity) < n

    if times is None:
        t = np.ones(n, np.float32)
    else:
        t = np.asarray(times, np.float32).reshape(-1)
    # Unique-timestep index (the reference's `sync_gaussian_to_time_ind`,
    # keyed by trunc(time*1000)).
    keys = np.trunc(t * 1000).astype(np.int64)
    uniq = np.sort(np.unique(keys))
    lut = {v: i for i, v in enumerate(uniq)}
    tind = np.array([lut[v] for v in keys], np.int32)

    return GaussianStore(
        params=params,
        alive=alive,
        time=jnp.pad(jnp.asarray(t), (0, pad)),
        time_ind=jnp.pad(jnp.asarray(tind), (0, pad)),
    )


def unique_times(store: GaussianStore) -> np.ndarray:
    """Sorted unique birth timestamps of alive Gaussians (host-side)."""
    alive = np.asarray(store.alive)
    return np.sort(np.unique(np.asarray(store.time)[alive]))


def active_arrays(store: GaussianStore, isotropic: bool = False):
    """Activated tensors for the renderer: (xyz, shs, opacity, scaling,
    rotation, alive)."""
    p = store.params
    return (
        p.xyz,
        get_features(p),
        get_opacity(p),
        get_scaling(p, isotropic),
        p.rotation,
        store.alive,
    )


def sh_degree_up(active_degree: int, max_degree: int) -> int:
    """`oneupSHdegree` (`rodygs_static.py:112`) — host-side static ramp."""
    return min(active_degree + 1, max_degree)


def to_state_dict(store: GaussianStore) -> dict[str, Any]:
    """Checkpoint-compatible field names (reference `state_dict`,
    `src/trainer/rodygs_static.py:321-347` model section)."""
    p = store.params
    return {
        "_xyz": p.xyz,
        "_features_dc": p.features_dc,
        "_features_rest": p.features_rest,
        "_scaling": p.scaling,
        "_rotation": p.rotation,
        "_opacity": p.opacity,
        "alive": store.alive,
        "time": store.time,
        "time_ind": store.time_ind,
    }


def from_state_dict(sd: dict[str, Any]) -> GaussianStore:
    params = GaussianParams(
        xyz=jnp.asarray(sd["_xyz"]),
        features_dc=jnp.asarray(sd["_features_dc"]),
        features_rest=jnp.asarray(sd["_features_rest"]),
        scaling=jnp.asarray(sd["_scaling"]),
        rotation=jnp.asarray(sd["_rotation"]),
        opacity=jnp.asarray(sd["_opacity"]),
    )
    cap = params.xyz.shape[0]
    alive = jnp.asarray(sd.get("alive", jnp.ones(cap, bool)))
    time = jnp.asarray(sd.get("time", jnp.ones(cap, jnp.float32)))
    tind = jnp.asarray(sd.get("time_ind", jnp.zeros(cap, jnp.int32)))
    return GaussianStore(params=params, alive=alive, time=time, time_ind=tind)
