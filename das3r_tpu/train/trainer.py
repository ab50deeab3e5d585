"""Stage-2 trainer — the TPU equivalent of ``train_gui.py`` (rendering runs)
and ``train_test_psnr.py`` (novel-view PSNR protocol), as a library function
plus a CLI.

Loop semantics mirror the reference (SURVEY.md §3.2/§3.4) but the loop SHAPE
is TPU-native: the per-epoch frame schedule is precomputed on the host
(random without replacement, like the reference's viewpoint_stack pops) and
each epoch executes as ONE jitted ``lax.scan`` chunk — no per-iteration host
round trip and no device->host metric fetches except at report/save points.

  * main Adam always steps; camera Adam gated on frame PSNR (train_gui
    :581-586);
  * SH degree bumps every 3000 iterations (static per chunk; chunks are
    split at bump boundaries);
  * eval mode: a test-pose-only pass over held-out cameras at every epoch
    boundary (the working version of train_test_psnr.py:109-149 — see
    step.test_pose_step docstring for the reference's silent no-op);
  * testing_iterations: masked test-view L1/PSNR appended to test_log.txt in
    the reference's exact line format (scrapers parse it);
  * saving_iterations: PLY + pose npy; checkpoint_iterations: state .npz.
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


def _plan_chunks(iterations: int, n_frames: int, seed: int):
    """Host-side schedule: shuffled-per-epoch uids, split into chunks at
    epoch AND sh-degree-bump (every 3000 iters) boundaries.
    Returns list of (start_iter, uid_array)."""
    rng = random.Random(seed)
    uids: list[int] = []
    while len(uids) < iterations:
        epoch = list(range(n_frames))
        rng.shuffle(epoch)
        uids.extend(epoch)
    uids = uids[:iterations]

    boundaries = {0, iterations}
    boundaries.update(range(0, iterations, n_frames))        # epoch starts
    boundaries.update(b for b in range(3000, iterations, 3000))
    cuts = sorted(boundaries)
    chunks = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        if b > a:
            chunks.append((a, np.asarray(uids[a:b], np.int32)))
    return chunks


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

    chunks = _plan_chunks(cfg.iterations, scene.n_frames, seed)
    events = sorted(set(testing_iterations) | set(saving_iterations)
                    | set(checkpoint_iterations))
    metric_handles = []          # (iter_range, device metrics) — fetched late
    last_loss_handle = None
    test_psnr_last = None
    use_chunks = True            # fall back to per-step dispatch if the
                                 # scan program exceeds compiler limits
                                 # (observed on very large scenes)
    t0 = time.perf_counter()

    def run_chunk(state, uids, settings):
        nonlocal use_chunks
        if use_chunks:
            try:
                return step_mod.train_chunk(
                    state, bundle.meta, jnp.asarray(uids), gt_images, fovx,
                    fovy, bg, settings, cfg,
                    spatial_lr_scale=scene.spatial_lr_scale,
                    optim_pose=optim_pose)
            except Exception as e:  # compile failure on huge scenes
                use_chunks = False
                progress(f"train_chunk compile failed ({str(e)[:120]}); "
                         "falling back to per-step dispatch")
        ms = []
        for uid in uids:
            state, m = step_mod.train_step(
                state, bundle.meta, jnp.asarray(int(uid)),
                gt_images[int(uid)], fovx[int(uid)], fovy[int(uid)], bg,
                settings, cfg, spatial_lr_scale=scene.spatial_lr_scale,
                optim_pose=optim_pose)
            ms.append(m)
        stacked = step_mod.StepMetrics(
            *[jnp.stack(x) for x in zip(*ms)])
        return state, stacked

    for start, uids in chunks:
        sh_degree = min(start // 3000, scene.max_sh_degree)
        if settings.sh_degree != sh_degree:
            settings = dataclasses.replace(settings, sh_degree=sh_degree)

        state, metrics = run_chunk(state, uids, settings)
        end = start + len(uids)
        metric_handles.append((end, metrics))
        last_loss_handle = metrics.loss

        # test-pose pass at epoch boundaries (train stack just refilled)
        if test is not None and optim_test_pose and end < cfg.iterations:
            for tuid in np.random.default_rng(seed + end).permutation(
                    test.n_frames):
                tp_state, _, _ = step_mod.test_pose_step(
                    tp_state, state.params, bundle.meta,
                    jnp.asarray(int(tuid)), test_gt[int(tuid)],
                    test_masks[int(tuid)], test_fovx[int(tuid)],
                    test_fovy[int(tuid)], bg, state.step, settings, cfg)

        # host-sync events (reports/saves) — the only device fetches
        for ev in [e for e in events if start < e <= end]:
            if ev in testing_iterations:
                _report_train(model_path, ev, state, bundle, settings,
                              gt_images, fovx, fovy, bg, progress)
            if ev in testing_iterations and test is not None:
                test_psnr_last = _report_test(
                    model_path, ev, state, tp_state, bundle, settings,
                    test_gt, test_masks, test_fovx, test_fovy, bg,
                    progress)
            if ev in saving_iterations and model_path:
                pc_dir = os.path.join(model_path, "point_cloud",
                                      f"iteration_{ev}")
                ckpt.save_scene_ply(
                    os.path.join(pc_dir, "point_cloud.ply"),
                    state.params, bundle.meta)
                ckpt.save_pose_npy(
                    os.path.join(model_path, "pose", f"pose_{ev}.npy"),
                    state.poses)
            if ev in checkpoint_iterations and model_path:
                ckpt.save_train_state(
                    os.path.join(model_path, f"chkpnt{ev}.npz"), state)

        if log_every and (start // log_every != end // log_every
                          or end == cfg.iterations):
            lossv = float(np.asarray(metrics.loss)[-1])
            psnrv = float(np.asarray(metrics.psnr)[-1])
            progress(f"[ITER {end}] loss {lossv:.5f} psnr {psnrv:.2f}")

    jax.block_until_ready(state.params.xyz)
    dt = time.perf_counter() - t0
    last_loss = (float(np.asarray(last_loss_handle)[-1])
                 if last_loss_handle is not None else float("nan"))
    return TrainResult(state=state, test_pose_state=tp_state,
                       last_loss=last_loss, test_psnr=test_psnr_last,
                       iters_per_sec=cfg.iterations / max(dt, 1e-9))


def _report_train(model_path, iteration, state, bundle, settings,
                  gt_images, fovx, fovy, bg, progress, n_sample: int = 5):
    """L1/PSNR on sampled TRAIN views -> train_log.txt (train_gui
    training_report :666-712 renders 5 sample train cameras)."""

    @jax.jit
    def eval_one(params, poses, uid):
        out = render_mod.render(params, bundle.meta, settings,
                                poses.pose(uid), bg, fovx[uid], fovy[uid],
                                mode="train")
        img = jnp.clip(out.image, 0.0, 1.0)
        gt = jnp.clip(gt_images[uid], 0.0, 1.0)
        return jnp.abs(img - gt).mean(), psnr_fn(img[None], gt[None]).mean()

    n = gt_images.shape[0]
    uids = np.linspace(0, n - 1, min(n_sample, n)).astype(int)
    pairs = [eval_one(state.params, state.poses, jnp.asarray(int(u)))
             for u in uids]
    l1_t = float(np.asarray(jnp.stack([p[0] for p in pairs])).mean())
    psnr_t = float(np.asarray(jnp.stack([p[1] for p in pairs])).mean())
    line = f"[ITER {iteration}] Evaluating train: L1 {l1_t} PSNR {psnr_t}"
    progress(line)
    if model_path:
        os.makedirs(model_path, exist_ok=True)
        with open(os.path.join(model_path, "train_log.txt"), "a") as f:
            f.write(line + "\n")
    return psnr_t


def _report_test(model_path, iteration, state, tp_state, bundle, settings,
                 test_gt, test_masks, test_fovx, test_fovy, bg, progress):
    """Masked test-view L1/PSNR over ALL test frames in one jitted call
    (one device->host fetch), appended to test_log.txt in the reference's
    exact format (train_test_psnr.training_report :241-302)."""

    @jax.jit
    def eval_one(params, poses, uid):
        pose = poses.pose(uid)
        out = render_mod.render(params, bundle.meta, settings, pose, bg,
                                test_fovx[uid], test_fovy[uid], mode="train")
        img = jnp.clip(out.image, 0.0, 1.0)
        gt = jnp.clip(test_gt[uid], 0.0, 1.0)
        m = 1.0 - test_masks[uid]
        p = img * m
        g = gt * m
        return jnp.abs(p - g).mean(), psnr_fn(p[None], g[None]).mean()

    n = test_gt.shape[0]
    l1s, psnrs = [], []
    for tuid in range(n):
        l1, ps = eval_one(state.params, tp_state.poses, jnp.asarray(tuid))
        l1s.append(l1)
        psnrs.append(ps)
    l1_t = float(np.asarray(jnp.stack(l1s)).mean())
    psnr_t = float(np.asarray(jnp.stack(psnrs)).mean())
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
    ap.add_argument("--max_points", type=int, default=1_500_000,
                    help="cap dense init at the N highest-confidence pixels (0 = keep all, reference behavior)")
    ap.add_argument("--white_background", action="store_true")
    ap.add_argument("--psnr_threshold", type=float, default=26.0)
    ap.add_argument("--dataset", default="davis")
    ap.add_argument("--gt_dynamic_mask", default=None)
    ap.add_argument("--test_iterations", type=int, nargs="*", default=None)
    ap.add_argument("--save_iterations", type=int, nargs="*", default=None)
    ap.add_argument("--checkpoint_iterations", type=int, nargs="*",
                    default=[])
    ap.add_argument("--log_every", type=int, default=50)
    args = ap.parse_args(argv)

    data = readers.load_scene(args.source_path, eval_mode=args.eval,
                              gt_dynamic_mask_dir=args.gt_dynamic_mask,
                              gt_mask_kind=args.dataset)
    bundle = scene_setup.build_scene(data, sh_degree=args.sh_degree,
                                     conf_thre=args.conf_thre,
                                     max_points=args.max_points or None)
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
        checkpoint_iterations=set(args.checkpoint_iterations),
        log_every=args.log_every)
    print(f"done: loss {result.last_loss:.5f} "
          f"iters/s {result.iters_per_sec:.2f} "
          f"test_psnr {result.test_psnr}")
    return result


if __name__ == "__main__":
    main()
