"""Evaluation CLI — `python -m rodygs_tpu.pipelines.eval`.

Capability parity with `src/pipelines/eval.py:20-98`: load the run's stored
train config + an eval config, locate `static_last.ckpt`/`dynamic_last.ckpt`,
rebuild datamodules (with the checkpoint-refined poses), run the evaluator.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..evalsuite.evaluator import RoDyGSEvaluator
from ..utils.config import apply_dotlist, instantiate_from_config, load_yaml, merge_configs


def parse_args(argv=None):
    parser = argparse.ArgumentParser("rodygs_tpu evaluation")
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="eval YAML (e.g. configs/eval/eval_wo_align.yaml)")
    parser.add_argument("-t", "--task", type=str, default="eval")
    parser.add_argument("-d", "--datadir", type=str, required=True)
    parser.add_argument("-m", "--modeldir", type=str, required=True,
                        help="run logdir containing train/ with checkpoints")
    parser.add_argument("--lpips_weights", type=str, default=None)
    parser.add_argument("--eval_batch_size", type=int, default=8,
                        help="test views rendered per jit call (lax.map "
                             "batch); 1 restores the per-view loop")
    args, unknown = parser.parse_known_args(argv)
    return args, unknown


def main(argv=None):
    from ..utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()  # honor JAX_PLATFORMS despite sitecustomize

    args, overrides = parse_args(argv)
    modeldir = Path(args.modeldir)
    train_cfg_path = modeldir / "train" / "config.yaml"
    config = merge_configs(load_yaml(str(train_cfg_path)),
                           load_yaml(args.config))
    if overrides:
        config = apply_dotlist(config, overrides)

    static_ckpt = modeldir / "train" / "static_last.ckpt"
    dynamic_ckpt = modeldir / "train" / "dynamic_last.ckpt"
    out_path = modeldir / args.task

    # rebuild datamodules; pose readers that consume the checkpoint get it
    static_dm = instantiate_from_config(
        config["static_data"], dirpath=args.datadir,
        ckpt_path=str(static_ckpt))
    dynamic_dm = None
    if not static_dm.skip_dynamic and "dynamic_data" in config:
        dynamic_dm = instantiate_from_config(
            config["dynamic_data"], dirpath=args.datadir,
            ckpt_path=str(static_ckpt))

    eval_params = dict((config.get("eval") or {}).get("params") or {})
    evaluator = RoDyGSEvaluator(
        dirpath=args.datadir,
        static_datamodule=static_dm,
        dynamic_datamodule=dynamic_dm,
        out_path=out_path,
        static_ckpt_path=static_ckpt,
        dynamic_ckpt_path=dynamic_ckpt,
        camera_lr=eval_params.get("camera_lr", config.get("camera_lr", -1)),
        num_opts=eval_params.get("num_opts", config.get("num_opts", -1)),
        lpips_weights=args.lpips_weights,
    )
    result = evaluator.eval(eval_batch_size=args.eval_batch_size)
    print(result)


if __name__ == "__main__":
    main()
