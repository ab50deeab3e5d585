"""Stage-2 trainer — the TPU equivalent of ``train_gui.py`` (rendering runs)
and ``train_test_psnr.py`` (novel-view PSNR protocol), as a library function
plus a CLI.

Loop semantics mirror the reference (SURVEY.md §3.2/§3.4):
  * random camera WITHOUT replacement per epoch (viewpoint_stack pop);
  * SH degree bumped every 3000 iterations (static -> at most 3 recompiles);
  * main Adam always steps, camera Adam gated on frame PSNR;
  * eval mode: when the train stack empties, one pass over held-out test
    cameras optimizing only their poses (working version of the reference's
    no-op — disable with optim_test_pose=False for strict parity);
  * testing_iterations: masked test-view L1/PSNR appended to test_log.txt in
    the reference's exact line format (scrapers parse it);
  * saving_iterations: PLY snapshot + pose npy; checkpoint_iterations: full
    state .npz.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.data import readers
from das3r_tpu.models import render as render_mod
from das3r_tpu.train import checkpoint as ckpt
from das3r_tpu.train import optim, scene_setup, step as step_mod
from das3r_tpu.train.config import ModelConfig, OptimizationConfig, to_json
from das3r_tpu.train.loss import masked_test_loss
from das3r_tpu.utils.image import psnr as psnr_fn


@dataclasses.dataclass
class TrainResult:
    state: step_mod.TrainState
    test_pose_state: step_mod.TestPoseState | None
    last_loss: float
    test_psnr: float | None
    iters_per_sec: float


def _to_device_stack(a):
    return jnp.asarray(a, jnp.float32)


def train_scene(
    bundle: scene_setup.SceneBundle,
    cfg: OptimizationConfig,
    *,
    model_path: str | None = None,
    white_background: bool = False,
    optim_pose: bool = True,
    optim_test_pose: bool = True,
    testing_iterations=(),
    saving_iterations=(),
    checkpoint_iterations=(),
    log_every: int = 50,
    seed: int = 0,
    progress=print,
) -> TrainResult:
    train = bundle.train_data
    test = bundle.test_data
    settings = bundle.settings
    scene = bundle.scene

    gt_images = _to_device_stack(train.images)
    fovx = _to_device_stack(train.fovx)
    fovy = _to_device_stack(train.fovy)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)

    state = step_mod.init_train_state(bundle.params, bundle.poses)
    tp_state = None
    test_gt = test_fovx = test_fovy = test_masks = None
    if test is not None:
        tp_state = step_mod.TestPoseState(
            poses=bundle.test_poses, opt=optim.adam_init(bundle.test_poses))
        test_gt = _to_device_stack(test.images)
        test_fovx = _to_device_stack(test.fovx)
        test_fovy = _to_device_stack(test.fovy)
        if test.gt_dynamic_mask is not None:
            test_masks = _to_device_stack(
                np.repeat(test.gt_dynamic_mask[:, None], 3, 1))
        else:
            test_masks = jnp.zeros_like(test_gt)

    rng = random.Random(seed)
    stack: list[int] = []
    sh_degree = 0
    last_loss = float("nan")
    test_psnr_last = None
    t0 = time.perf_counter()
    it_timed = 0

    for it in range(1, cfg.iterations + 1):
        if it % 3000 == 0 and sh_degree < scene.max_sh_degree:
            sh_degree += 1
            settings = dataclasses.replace(settings, sh_degree=sh_degree)

        if not stack:
            stack = list(range(scene.n_frames))
            rng.shuffle(stack)
            epoch_end = True
        else:
            epoch_end = False

        uid = stack.pop()
        state, metrics = step_mod.train_step(
            state, bundle.meta, jnp.asarray(uid), gt_images[uid],
            fovx[uid], fovy[uid], bg, settings, cfg,
            spatial_lr_scale=scene.spatial_lr_scale, optim_pose=optim_pose)
        it_timed += 1

        # test-pose pass when the train stack has just been refilled
        # (train_test_psnr.py:109-149 runs it when the stack empties)
        if (epoch_end and it > 1 and test is not None and optim_test_pose):
            order = list(range(test.n_frames))
            rng.shuffle(order)
            for tuid in order:
                tp_state, _, _ = step_mod.test_pose_step(
                    tp_state, state.params, bundle.meta, jnp.asarray(tuid),
                    test_gt[tuid], test_masks[tuid], test_fovx[tuid],
                    test_fovy[tuid], bg, state.step, settings, cfg)

        if it % log_every == 0 or it == cfg.iterations:
            last_loss = float(metrics.loss)
            progress(f"[ITER {it}] loss {last_loss:.5f} "
                     f"psnr {float(metrics.psnr):.2f} "
                     f"cam_step {bool(metrics.cam_stepped)}")

        if it in testing_iterations and test is not None:
            test_psnr_last = _report_test(
                model_path, it, state, tp_state, bundle, settings,
                test_gt, test_masks, test_fovx, test_fovy, bg, progress)

        if it in saving_iterations and model_path:
            pc_dir = os.path.join(model_path, "point_cloud",
                                  f"iteration_{it}")
            ckpt.save_scene_ply(os.path.join(pc_dir, "point_cloud.ply"),
                                state.params, bundle.meta)
            ckpt.save_pose_npy(os.path.join(model_path, "pose",
                                            f"pose_{it}.npy"), state.poses)

        if it in checkpoint_iterations and model_path:
            ckpt.save_train_state(
                os.path.join(model_path, f"chkpnt{it}.npz"), state)

    dt = time.perf_counter() - t0
    return TrainResult(state=state, test_pose_state=tp_state,
                       last_loss=last_loss, test_psnr=test_psnr_last,
                       iters_per_sec=it_timed / max(dt, 1e-9))


def _report_test(model_path, iteration, state, tp_state, bundle, settings,
                 test_gt, test_masks, test_fovx, test_fovy, bg, progress):
    """Masked test-view L1/PSNR, appended to test_log.txt in the reference's
    exact format (train_test_psnr.training_report :241-302)."""
    l1_sum, psnr_sum, n = 0.0, 0.0, 0
    for tuid in range(test_gt.shape[0]):
        pose = tp_state.poses.pose(tuid)
        out = render_mod.render(state.params, bundle.meta, settings, pose,
                                bg, test_fovx[tuid], test_fovy[tuid],
                                mode="train")
        img = jnp.clip(out.image, 0.0, 1.0)
        gt = jnp.clip(test_gt[tuid], 0.0, 1.0)
        m = 1.0 - test_masks[tuid]
        p = img * m
        g = gt * m
        l1_sum += float(jnp.abs(p - g).mean())
        psnr_sum += float(psnr_fn(p[None], g[None]).mean())
        n += 1
    l1_t, psnr_t = l1_sum / n, psnr_sum / n
    line = f"[ITER {iteration}] Evaluating test: L1 {l1_t} PSNR {psnr_t}"
    progress(line)
    if model_path:
        os.makedirs(model_path, exist_ok=True)
        with open(os.path.join(model_path, "test_log.txt"), "a") as f:
            f.write(line + "\n")
    return psnr_t


def main(argv=None):
    ap = argparse.ArgumentParser(description="DAS3R-TPU stage-2 trainer")
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--iter", "--iterations", dest="iterations", type=int,
                    default=4000)
    ap.add_argument("--eval", action="store_true",
                    help="hold out the (i+5)%%10 test split")
    ap.add_argument("--eval_pose", action="store_true", dest="optim_pose",
                    default=True)
    ap.add_argument("--no-optim-pose", dest="optim_pose",
                    action="store_false")
    ap.add_argument("--no-optim-test-pose", dest="optim_test_pose",
                    action="store_false", default=True,
                    help="strict parity with the reference (its test-pose "
                         "optimization is a silent no-op)")
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--conf_thre", type=float, default=1.0)
    ap.add_argument("--white_background", action="store_true")
    ap.add_argument("--psnr_threshold", type=float, default=26.0)
    ap.add_argument("--dataset", default="davis")
    ap.add_argument("--gt_dynamic_mask", default=None)
    ap.add_argument("--test_iterations", type=int, nargs="*", default=None)
    ap.add_argument("--save_iterations", type=int, nargs="*", default=None)
    ap.add_argument("--checkpoint_iterations", type=int, nargs="*",
                    default=[])
    args = ap.parse_args(argv)

    data = readers.load_scene(args.source_path, eval_mode=args.eval,
                              gt_dynamic_mask_dir=args.gt_dynamic_mask,
                              gt_mask_kind=args.dataset)
    bundle = scene_setup.build_scene(data, sh_degree=args.sh_degree,
                                     conf_thre=args.conf_thre)
    cfg = OptimizationConfig(iterations=args.iterations,
                             psnr_threshold=args.psnr_threshold)
    os.makedirs(args.model_path, exist_ok=True)
    with open(os.path.join(args.model_path, "cfg.json"), "w") as f:
        f.write(to_json(cfg))

    test_iters = (args.test_iterations if args.test_iterations is not None
                  else [args.iterations])
    save_iters = (args.save_iterations if args.save_iterations is not None
                  else [args.iterations])

    ckpt.save_pose_npy(os.path.join(args.model_path, "pose", "pose_org.npy"),
                       bundle.poses)
    result = train_scene(
        bundle, cfg, model_path=args.model_path,
        white_background=args.white_background,
        optim_pose=args.optim_pose, optim_test_pose=args.optim_test_pose,
        testing_iterations=set(test_iters),
        saving_iterations=set(save_iters),
        checkpoint_iterations=set(args.checkpoint_iterations))
    print(f"done: loss {result.last_loss:.5f} "
          f"iters/s {result.iters_per_sec:.2f} "
          f"test_psnr {result.test_psnr}")
    return result


if __name__ == "__main__":
    main()
