"""Independent numpy transliteration of the reference's densification
(`/root/reference/src/trainer/rodygs_static.py:151-319` — densify_and_clone,
densify_and_split, densify_and_prune, prune_points, cat/prune optimizer
surgery), cross-checked end-state against `train/densify.densify_and_prune`.

The transliteration follows the reference's exact order: clone-append (zero
Adam moments), split-select on the post-clone array (padded grads — clones
can never split in the same pass), child-append + split-source prune, then
the final opacity/size prune on the post-append array. Split-position noise
is zeroed on both sides (jax.random.normal monkeypatched), making children
exact parent copies, so the end states are comparable as multisets.

Also locks in the reference quirk this module reproduces: the screen-radius
prune (`big_points_vs`) is a dead path in the reference because
`densification_postfix` zeroes `max_radii2D` before `densify_and_prune`
reads it (`rodygs_static.py:169-180,285-300`); `apply_screen_size_prune=True`
opts into the intended semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodygs_tpu.models.gaussians import GaussianParams, GaussianStore
from rodygs_tpu.train.densify import DensifyStats, densify_and_prune


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def ref_densify_and_prune(leaves, mu, nu, accum, denom, radii, *,
                          max_grad, min_opacity, extent, percent_dense,
                          max_screen_size, screen_size_prune=False):
    """Reference semantics on dense arrays (grow/slice, like torch cat /
    boolean indexing). `leaves` is a dict of [n, ...] arrays including
    'time'/'time_ind' (gaussian_to_time{,_ind}). Returns the surviving rows
    of every leaf (params + mu/nu Adam moments).

    screen_size_prune=False models the shipped reference (max_radii2D is
    zeroed by densification_postfix before the prune reads it); True models
    the evidently intended behavior (radii carried: originals keep their
    accumulated values, appended entries start at zero).
    """
    leaves = {k: v.copy() for k, v in leaves.items()}
    mu = {k: v.copy() for k, v in mu.items()}
    nu = {k: v.copy() for k, v in nu.items()}
    radii = radii.copy()

    grads = np.where(denom > 0, accum / np.where(denom > 0, denom, 1), 0.0)

    def append(sel, overrides=None, repeat=1):
        nonlocal leaves, mu, nu, radii
        new = {}
        for k, v in leaves.items():
            rows = v[sel]
            if overrides and k in overrides:
                rows = overrides[k]
            new[k] = np.concatenate([rows] * repeat)
        leaves = {k: np.concatenate([v, new[k]]) for k, v in leaves.items()}
        n_new = new["xyz"].shape[0]
        mu = {k: np.concatenate([v, np.zeros((n_new,) + v.shape[1:], v.dtype)])
              for k, v in mu.items()}
        nu = {k: np.concatenate([v, np.zeros((n_new,) + v.shape[1:], v.dtype)])
              for k, v in nu.items()}
        radii = np.concatenate([radii, np.zeros(n_new, radii.dtype)])

    def keep(mask):
        nonlocal leaves, mu, nu, radii
        leaves = {k: v[mask] for k, v in leaves.items()}
        mu = {k: v[mask] for k, v in mu.items()}
        nu = {k: v[mask] for k, v in nu.items()}
        radii = radii[mask]

    # --- densify_and_clone (rodygs_static.py:246-283) -----------------------
    scal = np.exp(leaves["scaling"])
    clone_sel = (grads >= max_grad) & (scal.max(1) <= percent_dense * extent)
    append(clone_sel)

    # --- densify_and_split (rodygs_static.py:182-245) -----------------------
    padded_grad = np.concatenate(
        [grads, np.zeros(int(clone_sel.sum()), grads.dtype)])
    scal = np.exp(leaves["scaling"])
    split_sel = (padded_grad >= max_grad) & (scal.max(1) > percent_dense * extent)
    n_split = int(split_sel.sum())
    # zero split noise: children sit exactly at the parent position
    child_scaling = np.log(scal[split_sel] / (0.8 * 2)).astype(np.float32)
    append(split_sel, overrides={
        "xyz": leaves["xyz"][split_sel],
        "scaling": child_scaling,
    }, repeat=2)
    prune_filter = np.concatenate([split_sel, np.zeros(2 * n_split, bool)])
    keep(~prune_filter)

    # --- final prune (rodygs_static.py:285-300) ------------------------------
    opacity = _sigmoid(leaves["opacity"][:, 0])
    prune = opacity < min_opacity
    if max_screen_size is not None:
        big_vs = (radii > max_screen_size if screen_size_prune
                  else np.zeros(len(radii), bool))  # dead path in the reference
        big_ws = np.exp(leaves["scaling"]).max(1) > 0.1 * extent
        prune = prune | big_vs | big_ws
    keep(~prune)
    return leaves, mu, nu


def _random_state(seed, cap=256, n=100):
    rng = np.random.default_rng(seed)
    leaves = {
        "xyz": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "features_rest": rng.normal(size=(n, 3, 3)).astype(np.float32),
        # exp(scaling) in [0.012, 0.33]: spans clone (<=0.05), split (>0.05)
        # and world-prune (>0.1) regimes at extent=1, percent_dense=0.05
        "scaling": rng.uniform(np.log(0.012), np.log(0.33),
                               (n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
        # mix of clearly-dead (<0.005 activated) and clearly-alive opacities
        "opacity": np.where(rng.uniform(size=(n, 1)) < 0.15,
                            rng.uniform(-8, -6, (n, 1)),
                            rng.uniform(0.5, 3.0, (n, 1))).astype(np.float32),
        "time": rng.uniform(0, 1, (n,)).astype(np.float32),
        "time_ind": rng.integers(0, 5, (n,)).astype(np.int32),
    }
    mu = {k: rng.normal(size=v.shape).astype(np.float32)
          for k, v in leaves.items() if k not in ("time", "time_ind")}
    nu = {k: rng.uniform(0, 1, v.shape).astype(np.float32)
          for k, v in leaves.items() if k not in ("time", "time_ind")}
    accum = np.where(rng.uniform(size=n) < 0.4,
                     rng.uniform(0.3, 3.0, n), 0.0).astype(np.float32)
    denom = np.where(rng.uniform(size=n) < 0.85,
                     rng.integers(1, 5, n), 0).astype(np.float32)
    radii = np.where(rng.uniform(size=n) < 0.3,
                     rng.uniform(25, 80, n), rng.uniform(0, 10, n)
                     ).astype(np.float32)

    def pad(v):
        return np.concatenate(
            [v, np.zeros((cap - n,) + v.shape[1:], v.dtype)])

    params = GaussianParams(
        xyz=jnp.asarray(pad(leaves["xyz"])),
        features_dc=jnp.asarray(pad(leaves["features_dc"])),
        features_rest=jnp.asarray(pad(leaves["features_rest"])),
        scaling=jnp.asarray(pad(leaves["scaling"])),
        rotation=jnp.asarray(pad(leaves["rotation"])),
        opacity=jnp.asarray(pad(leaves["opacity"])),
    )
    store = GaussianStore(
        params=params,
        alive=jnp.asarray(pad(np.ones(n, bool))),
        time=jnp.asarray(pad(leaves["time"])),
        time_ind=jnp.asarray(pad(leaves["time_ind"])),
    )
    aux = {
        "mu_params": params._replace(
            **{k: jnp.asarray(pad(v)) for k, v in mu.items()}),
        "nu_params": params._replace(
            **{k: jnp.asarray(pad(v)) for k, v in nu.items()}),
    }
    stats = DensifyStats(grad_accum=jnp.asarray(pad(accum)),
                         denom=jnp.asarray(pad(denom)),
                         max_radii2d=jnp.asarray(pad(radii)))
    return leaves, mu, nu, accum, denom, radii, store, aux, stats


def _flatten_rows(leaves, mu, nu):
    parts = [leaves[k].reshape(leaves[k].shape[0], -1).astype(np.float64)
             for k in sorted(leaves)]
    parts += [mu[k].reshape(mu[k].shape[0], -1).astype(np.float64)
              for k in sorted(mu)]
    parts += [nu[k].reshape(nu[k].shape[0], -1).astype(np.float64)
              for k in sorted(nu)]
    rows = np.concatenate(parts, axis=1)
    order = np.lexsort(rows.T[::-1])
    return rows[order]


def _ours_as_rows(new_store, new_aux):
    alive = np.asarray(new_store.alive)
    p = new_store.params
    leaves = {
        "xyz": np.asarray(p.xyz)[alive],
        "features_dc": np.asarray(p.features_dc)[alive],
        "features_rest": np.asarray(p.features_rest)[alive],
        "scaling": np.asarray(p.scaling)[alive],
        "rotation": np.asarray(p.rotation)[alive],
        "opacity": np.asarray(p.opacity)[alive],
        "time": np.asarray(new_store.time)[alive],
        "time_ind": np.asarray(new_store.time_ind)[alive].astype(np.float32),
    }
    mu = {k: np.asarray(getattr(new_aux["mu_params"], k))[alive]
          for k in ("xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity")}
    nu = {k: np.asarray(getattr(new_aux["nu_params"], k))[alive]
          for k in ("xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity")}
    return _flatten_rows(leaves, mu, nu)


class TestDensifyMatchesReference:
    """End-state multiset equality with the transliteration (zero split
    noise on both sides)."""

    @pytest.mark.parametrize("seed,mss,apply_fix", [
        (0, None, False),
        (1, 20.0, False),
        (2, 20.0, True),
        (3, None, False),
        (4, 20.0, False),
    ])
    def test_end_state_matches(self, monkeypatch, seed, mss, apply_fix):
        (leaves, mu, nu, accum, denom, radii,
         store, aux, stats) = _random_state(seed)

        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
        new_store, new_aux, new_stats, info = densify_and_prune(
            store, aux, stats, jax.random.key(seed),
            max_grad=0.5, min_opacity=0.005, extent=1.0,
            percent_dense=0.05, max_screen_size=mss,
            apply_screen_size_prune=apply_fix)
        assert int(info.dropped) == 0

        ref_leaves, ref_mu, ref_nu = ref_densify_and_prune(
            {k: v for k, v in leaves.items()}, mu, nu, accum, denom, radii,
            max_grad=0.5, min_opacity=0.005, extent=1.0,
            percent_dense=0.05, max_screen_size=mss,
            screen_size_prune=apply_fix)
        ref_leaves["time_ind"] = ref_leaves["time_ind"].astype(np.float32)

        got = _ours_as_rows(new_store, new_aux)
        want = _flatten_rows(ref_leaves, ref_mu, ref_nu)
        assert got.shape == want.shape, (
            f"alive count {got.shape[0]} vs reference {want.shape[0]}")
        np.testing.assert_allclose(got, want, atol=1e-6)
        # post-densify stats reset to zero (densification_postfix)
        assert float(new_stats.grad_accum.max()) == 0.0
        assert float(new_stats.denom.max()) == 0.0
        assert float(new_stats.max_radii2d.max()) == 0.0

    def test_some_work_happened(self, monkeypatch):
        """Guard against the parametrized cases degenerating to no-ops."""
        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
        (_, _, _, _, _, _, store, aux, stats) = _random_state(1)
        _, _, _, info = densify_and_prune(
            store, aux, stats, jax.random.key(0),
            max_grad=0.5, min_opacity=0.005, extent=1.0,
            percent_dense=0.05, max_screen_size=20.0)
        assert int(info.num_cloned) > 0
        assert int(info.num_split) > 0
        assert int(info.num_pruned) > 0


class TestScreenSizePruneQuirk:
    """The reference's big_points_vs branch never fires (max_radii2D is
    zeroed before the prune reads it); ours reproduces that by default and
    applies the intended prune only on opt-in."""

    def _state(self):
        n, cap = 4, 16
        rng = np.random.default_rng(7)

        def pad(v):
            return np.concatenate(
                [v, np.zeros((cap - n,) + v.shape[1:], v.dtype)])

        params = GaussianParams(
            xyz=jnp.asarray(pad(rng.normal(size=(n, 3)).astype(np.float32))),
            features_dc=jnp.asarray(pad(np.zeros((n, 1, 3), np.float32))),
            features_rest=jnp.asarray(pad(np.zeros((n, 3, 3), np.float32))),
            scaling=jnp.asarray(pad(np.full((n, 3), np.log(0.01), np.float32))),
            rotation=jnp.asarray(pad(np.tile(
                np.array([[1, 0, 0, 0]], np.float32), (n, 1)))),
            opacity=jnp.asarray(pad(np.full((n, 1), 3.0, np.float32))),
        )
        store = GaussianStore(
            params=params, alive=jnp.asarray(pad(np.ones(n, bool))),
            time=jnp.zeros(cap), time_ind=jnp.zeros(cap, jnp.int32))
        aux = {"mu_params": jax.tree.map(jnp.zeros_like, params),
               "nu_params": jax.tree.map(jnp.zeros_like, params)}
        # huge accumulated screen radius on gaussian 2; no grads, high
        # opacity, tiny world size -> only the screen-size branch could act
        radii = np.zeros(cap, np.float32)
        radii[2] = 100.0
        stats = DensifyStats(grad_accum=jnp.zeros(cap), denom=jnp.ones(cap),
                             max_radii2d=jnp.asarray(radii))
        return store, aux, stats

    def test_dead_by_default_live_on_opt_in(self):
        store, aux, stats = self._state()
        kw = dict(max_grad=0.5, min_opacity=0.005, extent=1.0,
                  percent_dense=0.05, max_screen_size=20.0)
        new_store, _, _, info = densify_and_prune(
            store, aux, stats, jax.random.key(0), **kw)
        assert bool(new_store.alive[2])           # reference behavior: kept
        assert int(info.num_pruned) == 0
        new_store, _, _, info = densify_and_prune(
            store, aux, stats, jax.random.key(0),
            apply_screen_size_prune=True, **kw)
        assert not bool(new_store.alive[2])       # intended behavior: pruned
        assert int(info.num_pruned) == 1
