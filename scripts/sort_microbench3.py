"""Third sort microbench: 1D small-extent curve + unrolled per-band 1D
sorts vs the batched-2D path.

Findings so far (scripts/sort_microbench{,2}.py on v5e):
  * 1D (key,iota,10rows) stable: 17.8 ms @2.1M, 40.0 @4.19M, 64.5 @5.76M.
  * 2D [H, M] along dim 1: cost ~ linear in M, batch dim nearly free up to
    H=8 (429 ms @[1,5.76M] -> 56.1 @[8,720k]) — a completely different
    (and at H=1 much worse) lowering than the 1D path.

This measures (a) the 1D curve at band-scale extents, (b) H sequential
unrolled 1D sorts (the realistic band-split implementation), (c) the 2D
path at H=16/32 to find its plateau.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _key_rows(h, m, n_rows, tiles=8160):
    rng = np.random.default_rng(0)
    tile = rng.integers(0, max(tiles // h, 1), size=(h, m)).astype(np.uint32)
    depth = rng.integers(0, 1 << 19, size=(h, m)).astype(np.uint32)
    key = jnp.asarray(((tile << 19) | depth).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((h, max(n_rows, 1), m)),
                       dtype=jnp.float32)
    return key, rows


@functools.partial(jax.jit, static_argnums=(2, 3))
def chained_unrolled(key, rows, n_rows, reps):
    h = key.shape[0]

    def body(i, carry):
        key, rows = carry
        nkeys, nrows = [], []
        for b in range(h):          # h SEPARATE 1D sorts, unrolled
            kb = key[b]
            iota = jnp.arange(kb.shape[0], dtype=jnp.int32)
            ops = (kb, iota) + tuple(rows[b, r] for r in range(n_rows))
            out = jax.lax.sort(ops, num_keys=1, is_stable=True)
            rb = jnp.stack(out[2:], axis=0)
            nkeys.append(out[0] ^ rb[0].astype(jnp.int32))
            nrows.append(rb)
        return jnp.stack(nkeys, axis=0), jnp.stack(nrows, axis=0)

    key, rows = jax.lax.fori_loop(0, reps, body, (key, rows))
    return key[:, ::65536].sum() + rows[:, :, ::65536].sum()


@functools.partial(jax.jit, static_argnums=(2, 3))
def chained_2d(key, rows, n_rows, reps):
    def body(i, carry):
        key, rows = carry
        iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
        ops = (key, iota) + tuple(rows[:, r] for r in range(n_rows))
        out = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
        nrows = jnp.stack(out[2:], axis=1)
        nkey = out[0] ^ nrows[:, 0].astype(jnp.int32)
        return nkey, nrows

    key, rows = jax.lax.fori_loop(0, reps, body, (key, rows))
    return key[:, ::65536].sum() + rows[:, :, ::65536].sum()


def bench(fn, h, m, n_rows, reps, iters):
    key, rows = _key_rows(h, m, n_rows)
    args = (key, rows, n_rows, reps)
    float(jax.device_get(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args)))
        ts.append((time.perf_counter() - t0) * 1e3 / reps)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    kw = dict(n_rows=10, reps=args.reps, iters=args.iters)
    total = 4_960_256          # demand-fit total at the 1080p bench point
    for h in (2, 4, 8):
        m = -(-total // (h * 512)) * 512
        ms = bench(chained_unrolled, h, m, **kw)
        print(f"unrolled {h} x 1D[{m:,}]: {ms:8.2f} ms total", flush=True)
    for h in (16, 32):
        m = -(-total // (h * 512)) * 512
        ms = bench(chained_2d, h, m, **kw)
        print(f"2d [{h},{m:,}]: {ms:8.2f} ms total", flush=True)


if __name__ == "__main__":
    main()
