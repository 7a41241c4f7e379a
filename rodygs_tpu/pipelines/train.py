"""Training CLI — `python -m rodygs_tpu.pipelines.train`.

Capability parity with `src/pipelines/train.py:25-281`: argparse CLI, YAML
config merge + dotlist overrides, logdir layout
`logs/<group>/<name>_<seed>/train`, seeding, config + code snapshot,
`override_config` (num_iterations propagated into the dependent fields),
then build + run.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

import yaml

from ..utils.config import apply_dotlist, load_yaml, merge_configs
from ..utils.logging_utils import seed_all, set_logger
from .build import build_training_run


def check_argument_sanity(args) -> None:
    assert args.datadir is None or os.path.isdir(args.datadir), (
        f"datadir does not exist: {args.datadir}")
    for cfg in args.base:
        assert os.path.isfile(cfg), f"config does not exist: {cfg}"


def set_traindir(args, primary: bool = True, timeout_s: float = 300.0) -> Path:
    logdir = Path(args.logdir) / args.group / f"{args.name}_{args.seed}" / "train"
    # Collision protection applies to the one writing process. Secondaries
    # must NOT create the directory: on a shared filesystem a secondary
    # winning the mkdir race would make the primary's exist_ok=False check
    # fire on a perfectly fresh run. They wait for the primary's mkdir
    # instead (bounded — surfaces a dead primary rather than hanging).
    if primary:
        logdir.mkdir(parents=True,
                     exist_ok=args.debug or args.resume)
    else:
        deadline = time.time() + timeout_s
        while not logdir.is_dir():
            if time.time() > deadline:
                raise RuntimeError(
                    f"secondary process timed out waiting for the primary "
                    f"to create {logdir}")
            time.sleep(0.5)
    return logdir


def store_args_and_config(logdir: Path, args, config: dict) -> None:
    with open(logdir / "args.yaml", "w") as f:
        yaml.dump(vars(args), f)
    with open(logdir / "config.yaml", "w") as f:
        yaml.dump(config, f)


def store_code(logdir: Path) -> None:
    """Snapshot the package source alongside the run
    (`train.py:104-121`)."""
    src = Path(__file__).resolve().parents[1]
    dst = logdir / "code" / "rodygs_tpu"
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("__pycache__"))


def override_config(config: dict, num_iterations: int | None) -> dict:
    """Propagate a CLI num_iterations into every dependent field
    (`train.py:194-228`)."""
    if num_iterations is None:
        return config
    tp = config["trainer"]["params"]
    for section in ("static", "dynamic"):
        if section not in tp:
            continue
        p = tp[section]["params"]
        p["num_iterations"] = num_iterations
        p["position_lr_max_steps"] = num_iterations
        p["densify_until_iter"] = min(
            p.get("densify_until_iter", num_iterations), num_iterations)
        cam = p.get("camera_opt_config")
        if cam:
            cam["params"]["total_steps"] = num_iterations
        if "deform_lr_max_steps" in p:
            p["deform_lr_max_steps"] = num_iterations
    for key in ("static_data", "dynamic_data"):
        if key in config:
            dl = config[key]["params"].get("train_dloader_config")
            if dl and "params" in dl and dl["params"] is not None:
                dl["params"]["num_iterations"] = None  # infinite sampler
    return config


def parse_args(argv=None):
    parser = argparse.ArgumentParser("rodygs_tpu training")
    parser.add_argument("-d", "--datadir", type=str, default=None,
                        help="scene directory (overrides config dirpath)")
    parser.add_argument("-b", "--base", nargs="+", required=True,
                        help="base YAML config(s), merged left to right")
    parser.add_argument("-g", "--group", type=str, default="default")
    parser.add_argument("-n", "--name", type=str, required=True)
    parser.add_argument("-l", "--logdir", type=str, default="logs")
    parser.add_argument("-s", "--seed", type=int, default=777)
    parser.add_argument("--num_iterations", type=int, default=None)
    parser.add_argument("--capacity_factor", type=float, default=4.0)
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="save a resumable snapshot every k iterations")
    parser.add_argument("--resume", action="store_true",
                        help="resume from <logdir>/resume.ckpt if present")
    parser.add_argument("--mesh", type=str, default=None,
                        help='device mesh, e.g. "data=4,tile=2" or '
                             '"data=2,gauss=2,tile=2": frame data '
                             "parallelism x gaussian-store sharding x "
                             "tile-space sharding. Each step consumes "
                             "`data` frames (mean frame loss). Omit for "
                             "single-device training.")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    args, unknown = parser.parse_known_args(argv)
    return args, unknown


def parse_mesh_arg(spec: str):
    """'data=2,gauss=2,tile=2' -> Mesh via parallel.mesh.make_mesh."""
    from ..parallel.mesh import make_mesh

    sizes = {"data": 1, "gauss": 1, "tile": 1}
    for kv in spec.split(","):
        k, _, v = kv.partition("=")
        k = k.strip()
        if k not in sizes or not v.strip().isdigit():
            raise SystemExit(
                f"--mesh: expected 'data=N[,gauss=N][,tile=N]', got {spec!r}")
        sizes[k] = int(v)
    return make_mesh(n_data=sizes["data"], n_tile=sizes["tile"],
                     n_gauss=sizes["gauss"])


def main(argv=None):
    from ..utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()  # honor JAX_PLATFORMS despite sitecustomize

    from ..parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()  # no-op outside multi-host runtimes

    from ..utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()  # resumed/restarted runs skip compiles

    args, overrides = parse_args(argv)
    check_argument_sanity(args)
    if args.verbose:
        os.environ["VERBOSE_RUN"] = "1"

    config = merge_configs(*[load_yaml(p) for p in args.base])
    if overrides:
        config = apply_dotlist(config, overrides)
    config = override_config(config, args.num_iterations)

    seed_all(args.seed)
    from ..parallel.multihost import is_primary
    primary = is_primary()
    logdir = set_traindir(args, primary=primary)
    # each process logs to its own file (train.log / train.p<i>.log) —
    # interleaved appends to one shared file tear lines
    import jax
    log_name = "train" if primary else f"train.p{jax.process_index()}"
    logger = set_logger(logdir, name=log_name)
    if primary:
        store_args_and_config(logdir, args, config)
        store_code(logdir)

    mesh = parse_mesh_arg(args.mesh) if args.mesh else None
    if mesh is not None:
        logger.info(f"device mesh: {dict(mesh.shape)}")
    run = build_training_run(
        config, dirpath=args.datadir, logdir=logdir, seed=args.seed,
        capacity_factor=args.capacity_factor, logger=logger, mesh=mesh)
    run.checkpoint_every = args.checkpoint_every
    logger.info(f"training for {run.num_iterations} iterations")
    run.train(resume=args.resume)


if __name__ == "__main__":
    main()
