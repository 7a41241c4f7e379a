"""Collect the TPU A/B runs' steady-state lines into one table.

The hardware runbook (DESIGN.md "Environment lessons" / the /tmp recovery
orchestrator) writes each `profile_step.py --no_trace` variant's stdout to
<dir>/<name>.out. Each run ends with a line like

  [steady] 62.6 ms/step  (4.19 Mpix/s fwd+bwd+adam)  settled_profile=lean last_demand=534695

This script parses every *.out under --dir and prints a markdown table
sorted by step time, plus the deltas vs the `base` run — the artifact that
decides which render knobs (RODYGS_BWD_UNSORT / RODYGS_FWD_RECORDS /
RODYGS_BF16_RECORDS / RODYGS_TIGHT_RECT) become defaults.

  python scripts/ab_report.py [--dir /tmp/tpu_runs] [--base ab_base]
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

STEADY = re.compile(
    r"\[steady\]\s+([0-9.]+)\s+ms/step\s+\(([0-9.]+)\s+Mpix/s[^)]*\)"
    r"(?:\s+settled_profile=(\S+))?(?:\s+last_demand=(\S+))?")


def parse_out(path: Path):
    text = path.read_text(errors="replace")
    m = None
    for m in STEADY.finditer(text):
        pass  # keep the last steady line (re-runs append)
    if m is None:
        return None
    return {
        "name": path.stem,
        "ms": float(m.group(1)),
        "mpix": float(m.group(2)),
        "profile": m.group(3) or "?",
        "demand": m.group(4) or "?",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/tpu_runs")
    ap.add_argument("--base", default="ab_base",
                    help="run name the deltas are computed against")
    args = ap.parse_args()

    rows = []
    for path in sorted(Path(args.dir).glob("*.out")):
        parsed = parse_out(path)
        if parsed:
            rows.append(parsed)
    if not rows:
        raise SystemExit(f"no parsable [steady] lines under {args.dir}")

    base = next((r for r in rows if r["name"] == args.base), None)
    rows.sort(key=lambda r: r["ms"])
    print("| run | ms/step | Mpix/s | vs base | profile | demand |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        delta = (f"{(base['ms'] - r['ms']) / base['ms'] * 100:+.1f}%"
                 if base and r is not base else
                 ("base" if r is base else "—"))
        print(f"| {r['name']} | {r['ms']:.1f} | {r['mpix']:.2f} | {delta} "
              f"| {r['profile']} | {r['demand']} |")


if __name__ == "__main__":
    main()
