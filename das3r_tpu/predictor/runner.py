"""Stage-1 runner: video frames -> pairwise predictions -> global alignment
-> stage-1 output directory (the producer of everything stage 2 consumes).

Equivalent of the reference's ``launch.py --mode=eval_pose_custom`` flow
(pose_eval.pose_estimation_custom :255-330 + base_opt save_* :358-425):
writes the flat layout that ``das3r_tpu.data.rearrange`` then re-arranges
into a COLMAP-style scene dir.
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import numpy as np
from PIL import Image

from das3r_tpu.data import trajectory
from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D, Dust3rConfig
from das3r_tpu.predictor import alignment, inference, pairs


VIDEO_EXTS = {".mp4", ".avi", ".mov"}


def _fit_frame(img: Image.Image, size: int) -> np.ndarray:
    """Resize long side -> ``size``, center-crop to /16 multiples."""
    w, h = img.size
    scale = size / max(w, h)
    nw, nh = round(w * scale), round(h * scale)
    img = img.resize((nw, nh), Image.LANCZOS)
    cw, ch = (nw // 16) * 16, (nh // 16) * 16
    left, top = (nw - cw) // 2, (nh - ch) // 2
    img = img.crop((left, top, left + cw, top + ch))
    return np.asarray(img, np.float32) / 255.0


def _decode_video(path: str, stride: int, max_frames: int | None,
                  fps: float):
    """Sample frames from a video file (reference dust3r/utils/image.py
    :213-252 semantics: frame interval round(video_fps / fps) when
    ``fps > 0``, else every ``stride``-th frame; first ``max_frames``)."""
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path}")
    video_fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if fps > 0 and video_fps > 0:
        interval = max(1, int(round(video_fps / fps)))
    else:
        interval = max(1, stride)
    idxs = list(range(0, total, interval))
    if max_frames is not None:
        idxs = idxs[:max_frames]
    frames, names = [], []
    want = set(idxs)
    last = max(idxs) if idxs else -1
    k = 0
    while k <= last:
        ok, frame = cap.read()
        if not ok:
            break
        if k in want:
            frames.append(Image.fromarray(
                cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)))
            names.append(f"frame_{k:04d}.png")
        k += 1
    cap.release()
    assert frames, f"no frames decoded from {path}"
    return frames, names


def load_frames(image_dir: str, size: int = 512, stride: int = 1,
                max_frames: int | None = None, fps: float = 0.0):
    """Load, resize (long side -> ``size``) and crop to /16 multiples
    (reference dust3r/utils/image.py:146-275). Returns [F, 3, H, W] in
    [0, 1].

    ``image_dir`` may be a directory of images OR a video file
    (.mp4/.avi/.mov — decoded with cv2 like the reference's load_images
    video branch, image.py:213-252). For videos, ``fps > 0`` resamples to
    that frame rate; otherwise every ``stride``-th frame is kept."""
    p = Path(image_dir)
    if p.is_file() and p.suffix.lower() in VIDEO_EXTS:
        imgs, names = _decode_video(str(p), stride, max_frames, fps)
        out = [_fit_frame(im, size) for im in imgs]
        return np.stack(out).transpose(0, 3, 1, 2), names
    exts = {".png", ".jpg", ".jpeg"}
    files = sorted(q for q in p.iterdir() if q.suffix.lower() in exts)
    files = files[::stride]
    if max_frames is not None:
        files = files[:max_frames]
    assert files, f"no images under {image_dir}"
    out = [_fit_frame(Image.open(q).convert("RGB"), size) for q in files]
    return np.stack(out).transpose(0, 3, 1, 2), [q.name for q in files]


def save_stage1_outputs(out_dir: str, images01: np.ndarray,
                        scene: alignment.AlignedScene) -> None:
    """Write the flat stage-1 artifact layout (base_opt.py:358-425)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    F = images01.shape[0]
    for i in range(F):
        img = (images01[i].transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(img).save(out / f"frame_{i:04d}.png")
        np.save(out / f"frame_{i:04d}.npy", scene.depths[i])
        np.save(out / f"conf_{i:04d}.npy", scene.im_conf[i])
        np.save(out / f"dyna_avg_{i:04d}.npy", scene.dyna_avg[i])
        np.save(out / f"dyna_max_{i:04d}.npy", scene.dyna_max[i])
        Image.fromarray(
            (scene.dynamic_masks[i] * 255).astype(np.uint8)).save(
            out / f"dynamic_mask_{i:04d}.png")
    pos, quat = trajectory.c2w_to_tum(scene.poses_c2w.astype(np.float64))
    trajectory.write_tum(str(out / "pred_traj.txt"), pos, quat)
    np.savetxt(out / "pred_intrinsics.txt",
               scene.intrinsics.reshape(F, 9), fmt="%.6f")
    enlarge_seg_masks(str(out))


def enlarge_seg_masks(folder: str, kernel_size: int = 5,
                      prefix: str = "dynamic_mask") -> None:
    """5x5 dilation of the binary dynamic masks -> enlarged_dynamic_mask_*
    (reference dust3r/utils/image.py:277-283; consumed by the stage-2
    reader's enlarged_dynamic_masks side channel)."""
    import cv2
    import glob as globmod
    for mask_path in sorted(globmod.glob(f"{folder}/{prefix}_*.png")):
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        kernel = np.ones((kernel_size, kernel_size), np.uint8)
        enlarged = cv2.dilate(mask, kernel, iterations=1)
        cv2.imwrite(mask_path.replace(prefix, "enlarged_dynamic_mask"),
                    enlarged)


@dataclasses.dataclass
class Stage1Result:
    scene: alignment.AlignedScene
    n_frames: int
    out_dir: str


def run_scene(
    image_dir: str,
    out_dir: str,
    model: AsymmetricCroCo3D,
    model_params,
    *,
    scene_graph: str | None = None,
    aligner_cfg: alignment.AlignerConfig = alignment.AlignerConfig(),
    size: int = 512,
    stride: int = 1,
    max_frames: int | None = None,
    flows=None,
    raft_params=None,
    mask_refiner=None,   # VideoMaskPropagator (mask_refine.py) — the SAM2
                         # refinement slot, off by default like the
                         # reference (training.py:122 sam2_mask_refine)
    verbose=print,
) -> Stage1Result:
    images01, names = load_frames(image_dir, size=size, stride=stride,
                                  max_frames=max_frames)
    F = images01.shape[0]
    if F < 2:
        raise ValueError(f"need at least 2 frames, found {F} under "
                         f"{image_dir} (stride={stride})")
    graph = scene_graph or pairs.eval_scene_graph(F)
    edges = pairs.make_pairs(F, graph, symmetrize=True)
    verbose(f"stage1: {F} frames, graph {graph} -> {len(edges)} edges")

    preds = inference.run_pairs(model, model_params, images01, edges)
    verbose("stage1: pairwise inference done; aligning...")

    if flows is None and raft_params is not None \
            and aligner_cfg.flow_loss_weight > 0:
        from das3r_tpu.predictor.flow import compute_edge_flows
        verbose("stage1: computing RAFT flows for the alignment flow loss")
        flows = compute_edge_flows(raft_params, images01, edges)

    if F > 2:
        scene = alignment.align(
            edges, preds.pred_i, preds.pred_j, preds.conf_i, preds.conf_j,
            preds.mask_i, aligner_cfg, flows=flows)
    else:
        # exactly one symmetrized pair: closed-form PairViewer path
        # (reference pose_eval.py:119 / :315 — no optimization for 2 frames)
        scene = alignment.pair_view(
            edges, preds.pred_i, preds.pred_j, preds.conf_i, preds.conf_j,
            preds.mask_i, aligner_cfg)
    verbose(f"stage1: alignment loss {scene.final_loss:.5f}")

    if mask_refiner is not None:
        from das3r_tpu.predictor import mask_refine
        refined = mask_refine.refine_motion_masks(
            scene.dynamic_masks, images01, mask_refiner)
        verbose(f"stage1: mask refinement grew "
                f"{int(refined.sum() - scene.dynamic_masks.sum())} px")
        scene = scene._replace(dynamic_masks=refined)

    save_stage1_outputs(out_dir, images01, scene)
    return Stage1Result(scene=scene, n_frames=F, out_dir=out_dir)


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--ckpt", required=True,
                    help="torch .pth checkpoint (e.g. Kai422kx/das3r)")
    ap.add_argument("--scene_graph", default=None)
    ap.add_argument("--n_iter", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--motion_mask_thre", type=float, default=0.35)
    ap.add_argument("--refine_masks", action="store_true",
                    help="video-propagation mask refinement (the SAM2 "
                         "slot, optimizer.py:226-301; default propagator "
                         "is the dependency-free NeighborPropagator)")
    ap.add_argument("--bf16", action="store_true",
                    help="run the ViT trunk in bfloat16 (heads fp32)")
    args = ap.parse_args(argv)

    from das3r_tpu.models.croco.convert import (convert_torch_state_dict,
                                                load_torch_checkpoint)
    import jax

    import jax.numpy as _jnp
    cfg_m = Dust3rConfig(dtype=_jnp.bfloat16) if args.bf16 \
        else Dust3rConfig()
    model = AsymmetricCroCo3D(cfg_m)
    params = jax.tree.map(
        __import__("jax.numpy", fromlist=["asarray"]).asarray,
        convert_torch_state_dict(load_torch_checkpoint(args.ckpt)))
    cfg = alignment.AlignerConfig(niter=args.n_iter, lr=args.lr,
                                  motion_mask_thre=args.motion_mask_thre)
    refiner = None
    if args.refine_masks:
        from das3r_tpu.predictor.mask_refine import NeighborPropagator
        refiner = NeighborPropagator()
    run_scene(args.image_dir, args.output_dir, model, params,
              scene_graph=args.scene_graph, aligner_cfg=cfg,
              stride=args.stride, max_frames=args.max_frames,
              mask_refiner=refiner)


if __name__ == "__main__":
    main()
