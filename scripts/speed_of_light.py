"""HBM-bandwidth roofline for the compact-binning train step (VERDICT r3
#2: "a bytes-moved/HBM-BW bound for the sort-dominated stages").

Every fragment-scale stage of the step is memory-bound on a v5e (the only
MXU-heavy work is the SSIM convs and the Pallas compositing's log-
transmittance matmuls, both small next to the fragment traffic), so the
per-stage floor is bytes_moved / HBM_BW. This script prints that floor per
stage for a given (fitted capacity, record rows, image, store size) and —
when given measured per-stage times from a `scripts/profile_step.py` trace
— the fraction of speed-of-light each stage achieves.

The XLA fragment sort is modeled explicitly: `lax.sort` on TPU lowers to a
bitonic-style network of O(log^2 P) compare-exchange passes over the FULL
operand set; with C chunks of 2^k ... the effective pass count is reported
as measured_ms / single_pass_ms rather than assumed, which is exactly the
number a hand-rolled radix sort would have to beat (a 32-bit LSD radix at
8 bits/digit = 4 passes x (read+write) + histogram traffic).

Usage:
  python scripts/speed_of_light.py --capacity 4718592 --rows 10 \
      --width 1920 --height 1080 --n 262144 [--sort_ms 85 --expand_ms 12 ...]
"""

from __future__ import annotations

import argparse

# v5e (TPU v5 lite) HBM bandwidth, bytes/s. Public spec: 819 GB/s.
HBM_BW = 819e9


def stage_bytes(capacity: int, rows: int, width: int, height: int,
                n_store: int, table_rows: int = 24) -> dict[str, float]:
    """Bytes moved per stage, one full train step (fwd+bwd+adam).

    `capacity` = fitted fragment capacity C (every fragment-scale op's
    extent); `rows` = record payload rows riding the sort (10 core / 13
    with normals); `n_store` = gaussian-store capacity N (per-gaussian
    stages). Store parameter rows: xyz 3 + scaling 3 + rotation 4 +
    opacity 1 + SH 48 = 59 f32.
    """
    C, R, N = capacity, rows, n_store
    px = width * height
    f32 = 4
    param_rows = 59
    stages = {}
    # expand kernel: read the padded [table_rows, Nw] table in tile-window
    # DMAs (~1x table per step at the achieved window overlap), write
    # (key + rec rows) x C
    stages["expand"] = (table_rows * N * f32) + (1 + R) * C * f32
    # fragment sort: ONE pass floor = read + write of (key + iota + R rows)
    stages["sort_one_pass"] = 2 * (2 + R) * C * f32
    # tile kernel fwd: read 16-row records + write 8 image channels (rgb,
    # depth, alpha, normal0..2 share the pass) + T/contrib intermediates
    stages["tile_fwd"] = 16 * C * f32 + 8 * px * f32
    # tile kernel bwd: read records + saved fwd outputs, write 13 grad rows
    stages["tile_bwd"] = (16 + 13) * C * f32 + 8 * px * f32
    # backward unsort (default: sort by presort index): one pass floor over
    # (key + 13 grad rows)
    stages["unsort_one_pass"] = 2 * (1 + R) * C * f32
    # segsum kernel: read grad rows + table offsets, write per-gaussian rows
    stages["segsum"] = (R + 2) * C * f32 + R * N * f32
    # preprocess fwd+bwd: ~2x the param rows read + splat rows written
    stages["preprocess"] = 2 * (param_rows + 20) * N * f32
    # dual adam + stats: read params+mu+nu+grads, write params+mu+nu
    stages["adam"] = 7 * param_rows * N * f32
    # loss (L1+SSIM fwd+bwd): ~6 passes over the image pair
    stages["loss"] = 6 * 2 * 3 * px * f32
    return stages


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capacity", type=int, required=True,
                   help="fitted fragment capacity (profile_step last_demand"
                        " fit / settled_profile)")
    p.add_argument("--rows", type=int, default=10)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--n", type=int, default=131072,
                   help="gaussian store capacity")
    p.add_argument("--measured_step_ms", type=float, default=None)
    # optional measured per-stage ms (from profile_step.py trace table)
    for s in ("sort", "expand", "tile_fwd", "tile_bwd", "unsort", "segsum",
              "preprocess", "adam", "loss"):
        p.add_argument(f"--{s}_ms", type=float, default=None)
    args = p.parse_args()

    stages = stage_bytes(args.capacity, args.rows, args.width, args.height,
                         args.n)
    measured = {
        "sort_one_pass": args.sort_ms, "expand": args.expand_ms,
        "tile_fwd": args.tile_fwd_ms, "tile_bwd": args.tile_bwd_ms,
        "unsort_one_pass": args.unsort_ms, "segsum": args.segsum_ms,
        "preprocess": args.preprocess_ms, "adam": args.adam_ms,
        "loss": args.loss_ms,
    }
    print(f"workload: {args.width}x{args.height}, capacity={args.capacity}, "
          f"rows={args.rows}, store={args.n}; HBM {HBM_BW / 1e9:.0f} GB/s")
    print(f"{'stage':<16} {'bytes':>12} {'floor ms':>9} {'meas ms':>8} "
          f"{'x floor':>8}")
    total_floor = 0.0
    total_meas = 0.0
    for name, b in stages.items():
        floor = b / HBM_BW * 1e3
        total_floor += floor
        m = measured.get(name)
        if m is not None:
            total_meas += m
            print(f"{name:<16} {b:>12,.0f} {floor:>9.3f} {m:>8.2f} "
                  f"{m / floor:>8.2f}")
        else:
            print(f"{name:<16} {b:>12,.0f} {floor:>9.3f} {'-':>8} {'-':>8}")
    line = f"{'TOTAL':<16} {'':>12} {total_floor:>9.3f}"
    if args.measured_step_ms:
        line += (f" {args.measured_step_ms:>8.2f} "
                 f"{args.measured_step_ms / total_floor:>8.2f}")
        print(line)
        print(f"step speed-of-light fraction: "
              f"{total_floor / args.measured_step_ms * 100:.1f}% "
              f"(floor assumes single-pass sorts; an XLA bitonic sort is "
              f"O(log^2) passes — the measured sort/floor ratio IS the "
              f"radix-sort opportunity)")
    else:
        print(line)


if __name__ == "__main__":
    main()
