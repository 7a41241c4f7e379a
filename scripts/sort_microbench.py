"""Microbenchmark the fragment sort in isolation on the current backend.

The 1080p step's dominant cost is the XLA variadic comparison sort over
(key, iota, 10 record rows) at fragment capacity C (DESIGN.md speed-of-light
table: ~41% of the step). Every proposed lever — capacity fit, payload
packing, stability, key fusion, segmenting — turns on the actual cost curve
sort_ms(C, n_operands, stable), which had never been measured directly.

Timing discipline: a plain block_until_ready timing loop measured 0.15 ms
for a 2M x 12-operand sort through the axon tunnel — i.e. dispatch, not
execution. So each measurement chains `reps` data-dependent sorts inside a
jitted fori_loop (the key of sort k+1 is perturbed by a row of sort k's
output) and device_gets a scalar reduction; wall time divided by reps is a
true device execution time.

Usage: python scripts/sort_microbench.py [--iters 5] [--reps 20]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(c, n_rows, seed=0):
    rng = np.random.default_rng(seed)
    # realistic key distribution: (tile 13b | depth 19b) over 8160 tiles
    tile = rng.integers(0, 8160, size=c).astype(np.uint32)
    depth = rng.integers(0, 1 << 19, size=c).astype(np.uint32)
    key = jnp.asarray(((tile << 19) | depth).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((max(n_rows, 1), c)),
                       dtype=jnp.float32)
    return key, rows


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def chained_sort(key, rows, n_rows, reps, stable, num_keys, with_iota):
    c = key.shape[0]
    iota = jnp.arange(c, dtype=jnp.int32)

    def body(i, carry):
        key, rows = carry
        ops = (key, iota) if with_iota else (key,)
        ops = ops + tuple(rows[r] for r in range(n_rows))
        out = jax.lax.sort(ops, num_keys=num_keys, is_stable=stable)
        # data dependency: next key perturbed by this sort's output
        base = 2 if with_iota else 1
        if n_rows:
            nrows = jnp.stack(out[base:], axis=0)
            nkey = out[0] ^ nrows[0].astype(jnp.int32)
        else:
            nrows = rows
            nkey = out[0] ^ (out[1] if with_iota else i)
        return nkey, nrows

    key, rows = jax.lax.fori_loop(0, reps, body, (key, rows))
    return key[::65536].sum() + rows[:, ::65536].sum()


def bench(c, n_rows, *, stable, num_keys, with_iota, reps, iters):
    key, rows = make_inputs(c, n_rows)
    args = (key, rows, n_rows, reps, stable, num_keys, with_iota)
    float(jax.device_get(chained_sort(*args)))  # compile + 1 run
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.device_get(chained_sort(*args)))
        ts.append((time.perf_counter() - t0) * 1e3 / reps)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} dev={jax.devices()}", flush=True)

    def rec(name, c, ms):
        print(f"{name:44s} C={c:>9,}  {ms:8.2f} ms/sort", flush=True)

    kw = dict(reps=args.reps, iters=args.iters)
    # 1. capacity sweep, shipped shape: stable, 1 key, iota+10 rows
    caps = [1 << 21, 3 << 20, 1 << 22, 4_700_160, 5_300_224, 5_760_000,
            6_291_456, 1 << 23]
    if args.quick:
        caps = [1 << 22, 5_760_000]
    for c in caps:
        rec("shipped(stable,1key,iota+10rows)", c,
            bench(c, 10, stable=True, num_keys=1, with_iota=True, **kw))

    c0 = 5_760_000  # the settled huge capacity at the 1080p bench point
    # 2. stability variants
    rec("unstable,2keys(key,iota)+10rows", c0,
        bench(c0, 10, stable=False, num_keys=2, with_iota=True, **kw))
    rec("unstable,1key,iota+10rows", c0,
        bench(c0, 10, stable=False, num_keys=1, with_iota=True, **kw))
    # 3. operand count sweep (stable, shipped style)
    for n_rows in (0, 5, 13):
        rec(f"stable,1key,iota+{n_rows}rows", c0,
            bench(c0, n_rows, stable=True, num_keys=1, with_iota=True, **kw))
    # 4. bwd-unsort shape: unique i32 perm key + 10 grad rows
    rec("bwd-unsort stable 1key+10rows", c0,
        bench(c0, 10, stable=True, num_keys=1, with_iota=False, **kw))
    rec("bwd-unsort unstable 1key+10rows", c0,
        bench(c0, 10, stable=False, num_keys=1, with_iota=False, **kw))


if __name__ == "__main__":
    main()
