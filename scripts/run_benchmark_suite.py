#!/usr/bin/env python
"""Batch benchmark driver — the reference's scripts/*.sh as one tool.

Modes (reference counterparts):
  render      rendering_{davis,sintel}.sh: per scene, train 4000 iters on
              ALL frames then render a video.
  psnr        testing_psnr_{davis,sintel}.sh + get_testing_psnr_*.py:
              per scene, train with the (i+5)%10 held-out split, then
              scrape test_log.txt into the PSNR table.
  pose        launch.py --mode=eval_pose: stage-1 ATE/RPE per sequence
              (needs --ckpt).
  masks       table_mask protocol: predicted dynamic-mask IoU vs GT.

Scene dirs are expected under <data_root>/<scene> in the rearranged
COLMAP-style layout.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from das3r_tpu.eval import harness


def scenes_for(dataset: str, override):
    if override:
        return override
    return (harness.DAVIS_SCENES if dataset == "davis"
            else harness.SINTEL_SCENES)


def run_render(args):
    from das3r_tpu.train import trainer
    from das3r_tpu.eval import render_tool
    for scene in scenes_for(args.dataset, args.scenes):
        src = os.path.join(args.data_root, scene)
        mdl = os.path.join(args.output_root, scene)
        print(f"=== {scene}: training {args.iterations} iters")
        trainer.main(["-s", src, "-m", mdl, "--iter", str(args.iterations),
                      "--save_iterations", str(args.iterations)])
        render_tool.render_sets(src, mdl, args.iterations, get_video=True)


def run_psnr(args):
    from das3r_tpu.train import trainer
    for scene in scenes_for(args.dataset, args.scenes):
        src = os.path.join(args.data_root, scene)
        mdl = os.path.join(args.output_root, scene)
        print(f"=== {scene}: PSNR protocol")
        cli = ["-s", src, "-m", mdl, "--iter", str(args.iterations),
               "--eval", "--dataset", args.dataset]
        if args.gt_dynamic_mask:
            cli += ["--gt_dynamic_mask", args.gt_dynamic_mask]
        if args.strict_parity:
            cli += ["--no-optim-test-pose"]
        trainer.main(cli)
    table = harness.psnr_table(args.output_root,
                               scenes_for(args.dataset, args.scenes))
    print(harness.format_psnr_table(table))
    with open(os.path.join(args.output_root,
                           f"psnr_{args.dataset}.json"), "w") as f:
        json.dump(table, f, indent=2)


def run_pose(args):
    import jax
    import jax.numpy as jnp
    from das3r_tpu.eval import pose_eval
    from das3r_tpu.models.croco.convert import (convert_torch_state_dict,
                                                load_torch_checkpoint)
    from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D
    from das3r_tpu.predictor import alignment
    model = AsymmetricCroCo3D()
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(
        load_torch_checkpoint(args.ckpt)))
    results, summary = pose_eval.eval_pose_estimation(
        args.dataset, args.data_root, args.output_root, model, params,
        alignment.AlignerConfig(), seq_list=args.scenes)
    print(summary)


def run_masks(args):
    from das3r_tpu.eval import davis_eval
    table, summary = davis_eval.eval_dataset_masks(
        args.output_root, args.gt_dynamic_mask,
        scenes_for(args.dataset, args.scenes))
    print(json.dumps({"per_scene": {k: v for k, v in table.items()},
                      "summary": summary}, indent=2))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["render", "psnr", "pose", "masks"])
    ap.add_argument("--dataset", default="davis",
                    choices=["davis", "sintel", "tum"])
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--iterations", type=int, default=4000)
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--gt_dynamic_mask", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--strict_parity", action="store_true")
    args = ap.parse_args(argv)
    {"render": run_render, "psnr": run_psnr, "pose": run_pose,
     "masks": run_masks}[args.mode](args)


if __name__ == "__main__":
    main()
