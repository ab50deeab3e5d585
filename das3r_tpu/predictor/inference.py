"""Pairwise inference: run the predictor over a scene graph of frame pairs.

TPU-first restructuring of the reference's ``inference`` (dust3r/
inference.py:155-174): instead of re-encoding both images of every (possibly
symmetrized) pair, every unique frame is encoded exactly ONCE in batches,
then the decoder+heads run over pair batches gathering the cached encoder
tokens. Static shapes throughout; batch sizes are padded to avoid
recompilation.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D

# ImgNorm: the stage-1 model consumes images normalized to mean .5/std .5
# (reference dust3r/utils/image.py ImgNorm)
IMG_MEAN = 0.5
IMG_STD = 0.5


def normalize_images(images01: np.ndarray) -> np.ndarray:
    """[F, 3, H, W] in [0,1] -> ImgNorm'ed."""
    return (images01 - IMG_MEAN) / IMG_STD


@dataclasses.dataclass
class PairPredictions:
    """Stacked per-edge outputs (numpy, ready for alignment)."""
    pred_i: np.ndarray   # [E, H, W, 3]
    pred_j: np.ndarray   # [E, H, W, 3]
    conf_i: np.ndarray   # [E, H, W]
    conf_j: np.ndarray   # [E, H, W]
    mask_i: np.ndarray   # [E, H, W]
    mask_j: np.ndarray   # [E, H, W]


def _pad_to(x: jax.Array, n: int) -> jax.Array:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)


def run_pairs(
    model: AsymmetricCroCo3D,
    params,
    images01: np.ndarray,          # [F, 3, H, W] in [0, 1]
    edges: list,
    encode_batch: int = 8,
    decode_batch: int = 8,
    portrait: bool = False,
) -> PairPredictions:
    """Encode-once + per-pair decode over ``edges``.

    ``portrait``: the frames are portrait images stored transposed in the
    landscape [F, 3, H, W] stack (ManyAR convention); predictions come back
    in the landscape buffer layout, like the reference's
    transpose_to_landscape heads.
    """
    F, _, H, W = images01.shape
    th, tw = (W, H) if portrait else (H, W)     # true orientation
    imgs = jnp.asarray(normalize_images(images01), jnp.float32)

    encode = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, portrait=portrait, method="encode"))

    def _dec(p, f1, p1, f2, p2):
        r1, r2 = model.apply({"params": p}, f1, p1, f2, p2, th, tw,
                             method="decode")
        if portrait:
            from das3r_tpu.models.croco.dust3r import transposed_result
            r1, r2 = transposed_result(r1), transposed_result(r2)
        return r1, r2

    dec_fn = jax.jit(_dec)

    # ---- encode all frames once, in fixed-size batches
    feats = []
    poss = []
    nb = -(-F // encode_batch)
    for b in range(nb):
        chunk = imgs[b * encode_batch:(b + 1) * encode_batch]
        chunk = _pad_to(chunk, encode_batch)
        f, pos = encode(params, chunk)
        feats.append(f)
        poss.append(pos)
    feats = jnp.concatenate(feats, 0)[:F]
    poss = jnp.concatenate(poss, 0)[:F]

    # ---- decode pair batches
    E = len(edges)
    ei = np.asarray([i for i, _ in edges])
    ej = np.asarray([j for _, j in edges])
    out = {k: [] for k in ("pred_i", "pred_j", "conf_i", "conf_j",
                           "mask_i", "mask_j")}
    nb = -(-E // decode_batch)
    for b in range(nb):
        sl = slice(b * decode_batch, (b + 1) * decode_batch)
        bi = jnp.asarray(ei[sl])
        bj = jnp.asarray(ej[sl])
        n_live = bi.shape[0]
        bi = _pad_to(bi, decode_batch)
        bj = _pad_to(bj, decode_batch)
        r1, r2 = dec_fn(params, feats[bi], poss[bi], feats[bj], poss[bj])
        out["pred_i"].append(np.asarray(r1["pts3d"])[:n_live])
        out["pred_j"].append(np.asarray(r2["pts3d_in_other_view"])[:n_live])
        out["conf_i"].append(np.asarray(r1["conf"])[:n_live])
        out["conf_j"].append(np.asarray(r2["conf"])[:n_live])
        out["mask_i"].append(np.asarray(r1["dynamic_mask"])[:n_live])
        out["mask_j"].append(np.asarray(r2["dynamic_mask"])[:n_live])

    return PairPredictions(**{k: np.concatenate(v, 0)
                              for k, v in out.items()})


def find_opt_scaling(gt_pts1, gt_pts2, pr_pts1, pr_pts2=None,
                     fit_mode: str = "weiszfeld_stop_grad",
                     valid1=None, valid2=None):
    """Per-batch optimal scale s minimizing ||pr - s * gt|| over valid
    pixels (reference dust3r/inference.py:208-252) — used by the
    scale/shift-invariant test criteria and training visualization.

    gt/pr: [B, H, W, 3]; validX: [B, H, W] bool or None. TPU-first detail:
    the reference routes invalid pixels through NaNs + nan-reductions; we
    carry an explicit weight mask instead (identical arithmetic, no NaN
    traffic, jit-safe). Modes: ``avg`` (closed-form L2), ``median``,
    ``weiszfeld`` (10 IRLS iterations); ``*_stop_grad`` detaches."""
    pts_g, pts_p, w = [gt_pts1], [pr_pts1], [
        jnp.ones(gt_pts1.shape[:3]) if valid1 is None
        else valid1.astype(jnp.float32)]
    if gt_pts2 is not None:
        pts_g.append(gt_pts2)
        pts_p.append(pr_pts2)
        w.append(jnp.ones(gt_pts2.shape[:3]) if valid2 is None
                 else valid2.astype(jnp.float32))
    B = gt_pts1.shape[0]
    all_gt = jnp.concatenate([p.reshape(B, -1, 3) for p in pts_g], 1)
    all_pr = jnp.concatenate([p.reshape(B, -1, 3) for p in pts_p], 1)
    valid = jnp.concatenate([m.reshape(B, -1) for m in w], 1)

    dot_gt_pr = (all_pr * all_gt).sum(-1)
    dot_gt_gt = (all_gt * all_gt).sum(-1)

    def wmean(x, wt):
        return (x * wt).sum(1) / jnp.maximum(wt.sum(1), 1e-8)

    if fit_mode.startswith("avg"):
        scaling = wmean(dot_gt_pr, valid) / wmean(dot_gt_gt, valid)
    elif fit_mode.startswith("median"):
        r = dot_gt_pr / jnp.maximum(dot_gt_gt, 1e-12)
        # masked median: invalid slots to +inf, take the k-th smallest
        # (torch.nanmedian takes the LOWER middle element on even counts)
        n_valid = valid.sum(1).astype(jnp.int32)
        r_s = jnp.sort(jnp.where(valid > 0, r, jnp.inf), axis=1)
        lo = jnp.maximum((n_valid - 1) // 2, 0)
        scaling = jnp.take_along_axis(r_s, lo[:, None], 1)[:, 0]
    elif fit_mode.startswith("weiszfeld"):
        scaling = wmean(dot_gt_pr, valid) / wmean(dot_gt_gt, valid)
        for _ in range(10):
            dis = jnp.linalg.norm(
                all_pr - scaling[:, None, None] * all_gt, axis=-1)
            wt = valid / jnp.maximum(dis, 1e-8)
            scaling = wmean(dot_gt_pr, wt) / wmean(dot_gt_gt, wt)
    else:
        raise ValueError(f"bad {fit_mode=}")

    if fit_mode.endswith("stop_grad"):
        scaling = jax.lax.stop_gradient(scaling)
    return jnp.maximum(scaling, 1e-3)


def apply_manyar(model: AsymmetricCroCo3D, params, img1, img2,
                 true_shape1: np.ndarray, true_shape2: np.ndarray,
                 **apply_kw):
    """Mixed-orientation two-view forward — the jit-friendly equivalent of
    the reference's ManyAR boolean-index split (patch_embed.py:55-70 +
    misc.py transpose_to_landscape): the batch is grouped on the host by the
    (portrait1, portrait2) combination, each group runs the static-flag
    forward, and results merge back in input order. Maps come back in the
    landscape buffer layout.

    img1/img2: [B, 3, H, W] landscape buffers; true_shapeX: [B, 2] (h, w).
    """
    B = img1.shape[0]
    p1 = np.asarray(true_shape1)[:, 0] > np.asarray(true_shape1)[:, 1]
    p2 = np.asarray(true_shape2)[:, 0] > np.asarray(true_shape2)[:, 1]
    res1_parts: list = [None] * B
    res2_parts: list = [None] * B
    for a in (False, True):
        for b in (False, True):
            idx = np.nonzero((p1 == a) & (p2 == b))[0]
            if idx.size == 0:
                continue
            r1, r2 = model.apply(
                {"params": params}, img1[idx], img2[idx],
                portrait1=bool(a), portrait2=bool(b), **apply_kw)
            for k, gi in enumerate(idx):
                res1_parts[gi] = {kk: vv[k] for kk, vv in r1.items()}
                res2_parts[gi] = {kk: vv[k] for kk, vv in r2.items()}
    res1 = {k: jnp.stack([d[k] for d in res1_parts])
            for k in res1_parts[0]}
    res2 = {k: jnp.stack([d[k] for d in res2_parts])
            for k in res2_parts[0]}
    return res1, res2
