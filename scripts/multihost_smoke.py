"""Two-process multi-host smoke test on CPU (SURVEY.md §5.8 evidence).

Launches TWO OS processes, each with 4 virtual CPU devices, bootstraps
multi-process JAX through `parallel.multihost.maybe_initialize_distributed`
(the explicit RODYGS_COORDINATOR env contract — the same code path a pod
slice uses), and runs the FULL sharded pipeline from
`__graft_entry__.dryrun_multichip(8)` over the resulting 8 GLOBAL devices:
static step + sharded densify + dynamic (motion-basis) step on the
data=2 x gauss=2 x tile=2 mesh, with the `data` axis spanning the two
processes — so every `pmean`/`psum`/`all_gather` on that axis crosses the
process boundary (Gloo transport on CPU; ICI/DCN on a real slice).

Success criterion: both workers print the same finite losses the
single-process dry run produces (the mesh math is process-count invariant).

Usage:
    python scripts/multihost_smoke.py            # launcher, spawns workers
    python scripts/multihost_smoke.py --worker N # internal
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
COORD = "127.0.0.1:19773"


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["RODYGS_COORDINATOR"] = COORD
    os.environ["RODYGS_NUM_PROCESSES"] = "2"
    os.environ["RODYGS_PROCESS_ID"] = str(pid)
    sys.path.insert(0, str(REPO))
    from rodygs_tpu.parallel.multihost import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "env bootstrap did not trigger"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    print(f"[worker {pid}] process {jax.process_index()}/2, "
          f"{jax.device_count()} global devices", flush=True)

    import __graft_entry__ as graft

    graft.dryrun_multichip(8)

    # --- filesystem discipline: exactly one writer per shared logdir ------
    fsdir = Path(os.environ["SMOKE_FS_DIR"])
    from rodygs_tpu.parallel.multihost import barrier, is_primary
    from rodygs_tpu.utils.checkpoint import save_checkpoint

    if is_primary():
        assert jax.process_index() == 0
        save_checkpoint(fsdir / "static_last.ckpt", {"writer": pid}, 1)
        # match the two barriers the non-primary's gated save_resume /
        # save_checkpoints calls issue (both use the "rodygs_ckpt" tag)
        barrier("rodygs_ckpt")
        barrier("rodygs_ckpt")
    else:
        # drive the REAL gates on an uninitialized instance: if the
        # is_primary early-return were removed, these would raise
        # AttributeError (no self.static / self.logdir) or write files
        from rodygs_tpu.train.trainer_joint import RoDyGSTrainer

        dummy = RoDyGSTrainer.__new__(RoDyGSTrainer)
        dummy.save_resume(fsdir / "resume.ckpt", 1, None)
        dummy.save_checkpoints(1)
        assert not (fsdir / "resume.ckpt").exists(), \
            "non-primary process wrote resume.ckpt"
    print(f"[worker {pid}] OK", flush=True)


def launch() -> int:
    import tempfile

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    fsdir = tempfile.mkdtemp(prefix="multihost_fs_")
    env["SMOKE_FS_DIR"] = fsdir
    # shared dir for the dry run's resume roundtrip: the primary writes
    # dryrun_resume.ckpt here, BOTH processes read it back (the round-4
    # per-process-tempdir regression made worker 1 FileNotFoundError)
    shared_tmp = os.path.join(fsdir, "shared_tmp")
    os.makedirs(shared_tmp)
    env["RODYGS_SHARED_TMP"] = shared_tmp
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid)],
            cwd=str(REPO), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=840)
        ok = p.returncode == 0 and f"[worker {pid}] OK" in out
        tail = "\n".join(out.strip().splitlines()[-6:])
        print(f"--- worker {pid} (rc={p.returncode}) ---\n{tail}", flush=True)
        rc |= 0 if ok else 1

    # exactly-one-writer assertion: the primary's checkpoint exists and
    # records process 0; nothing else wrote to the shared dir (shared_tmp
    # legitimately holds the dry run's primary-written resume roundtrip)
    written = sorted(os.path.basename(f) for f in Path(fsdir).iterdir())
    roundtrip = sorted(
        os.path.basename(f) for f in Path(shared_tmp).iterdir())
    if written != ["shared_tmp", "static_last.ckpt"] \
            or roundtrip != ["dryrun_resume.ckpt"]:
        print(f"FS DISCIPLINE VIOLATION: shared dir holds {written}, "
              f"shared_tmp holds {roundtrip}", flush=True)
        rc |= 1
    else:
        sys.path.insert(0, str(REPO))
        from rodygs_tpu.utils.checkpoint import load_checkpoint

        sd, _ = load_checkpoint(Path(fsdir) / "static_last.ckpt")
        if sd["writer"] != 0:
            print(f"FS DISCIPLINE VIOLATION: writer was {sd['writer']}",
                  flush=True)
            rc |= 1
    print("MULTIHOST_SMOKE " + ("PASS" if rc == 0 else "FAIL"), flush=True)
    return rc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is None:
        sys.exit(launch())
    worker(args.worker)
