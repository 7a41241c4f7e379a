"""Batched (band-split) fragment-sort microbenchmark.

sort_microbench.py showed the 5.76M x (key,iota,10 rows) stable sort costs
64.5 ms on-chip with a superlinear capacity curve (17.8 ms at 2.1M). If
fragments are partitioned into H tile-bands (each fragment belongs to
exactly one tile, so bands partition exactly), the sort becomes H
independent sorts of C/H — expressible as ONE batched lax.sort over
[H, C/H] along the last axis. This measures whether XLA's batched sort
realizes the small-sort win or pays a batching penalty.

Usage: python scripts/sort_microbench2.py
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def chained_batched_sort(key, rows, n_rows, reps):
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


def bench(h, m, n_rows, reps, iters):
    rng = np.random.default_rng(0)
    tile = rng.integers(0, 8160 // h, size=(h, m)).astype(np.uint32)
    depth = rng.integers(0, 1 << 19, size=(h, m)).astype(np.uint32)
    key = jnp.asarray(((tile << 19) | depth).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((h, max(n_rows, 1), m)),
                       dtype=jnp.float32)
    args = (key, rows, n_rows, reps)
    float(jax.device_get(chained_batched_sort(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.device_get(chained_batched_sort(*args)))
        ts.append((time.perf_counter() - t0) * 1e3 / reps)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    total = 5_760_000
    for h in (1, 2, 4, 8):
        m = -(-total // (h * 512)) * 512
        ms = bench(h, m, 10, args.reps, args.iters)
        print(f"bands={h} [{h},{m:,}] (key,iota,10rows) stable:"
              f" {ms:8.2f} ms total", flush=True)
    # capacity-fit point on top of banding (perfect fit, no dead slots)
    for h in (2, 4):
        m = -(-4_960_000 // (h * 512)) * 512
        ms = bench(h, m, 10, args.reps, args.iters)
        print(f"bands={h} [{h},{m:,}] fit-4.96M total: {ms:8.2f} ms total",
              flush=True)


if __name__ == "__main__":
    main()
