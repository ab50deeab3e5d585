#!/usr/bin/env python
"""Train the TINY stage-1 predictor on the synthetic wall world until the
mask heads actually LEARN (VERDICT r4 item 4).

The published DAS3R/MonST3R checkpoints are not downloadable in this
zero-egress environment, so the full pipeline was only ever exercised
with random weights. This script trains the TINY CroCo on
``WallTwoViewDataset`` (the same ray-traced wall + red-square world the
quality harness renders) with the reference criterion
ConfLoss(Regr3D_MMask(L21)) and reports held-out dynamic-mask IoU; with
``--freeze none`` (default here — no pretrained trunk exists to freeze)
the pointmap path trains too, giving the downstream alignment
non-random geometry.

Writes <out>/stage1_tiny.npz (full params, quality_e2e --stage1_ckpt
format) and prints one JSON line with the held-out mask IoU.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def mask_iou_eval(model, params, dataset, batch_size=8, thr=0.5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from das3r_tpu.eval.masks import mask_iou
    from das3r_tpu.predictor.datasets import batch_iterator

    apply = jax.jit(lambda p, i1, i2: model.apply(
        {"params": p}, i1, i2, deterministic=True))
    ious = []
    for img1, img2, batch in batch_iterator(dataset, batch_size, seed=0,
                                            shuffle=False,
                                            drop_last=False):
        res1, res2 = apply(params, jnp.asarray(img1), jnp.asarray(img2))
        for res, gt in ((res1, batch.gt_mask_1), (res2, batch.gt_mask_2)):
            pred = np.asarray(res["dynamic_mask"]) > thr
            for b in range(pred.shape[0]):
                ious.append(mask_iou(pred[b], gt[b] > 0.5))
    return float(np.mean(ious))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/stage1_tiny")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_test", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="from-scratch TINY wants a larger lr than the "
                         "reference's 5e-5 fine-tune recipe")
    ap.add_argument("--resolution", type=int, nargs=2, default=[64, 48],
                    help="W H (multiples of 16)")
    ap.add_argument("--freeze", default="none",
                    choices=("none", "encoder_and_3d_predictor"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from das3r_tpu.models.croco.convert import convert_torch_state_dict
    from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D
    from das3r_tpu.models.croco.testkit import TINY, random_torch_state_dict
    from das3r_tpu.predictor import train_loop, training
    from das3r_tpu.predictor.datasets import WallTwoViewDataset

    model = AsymmetricCroCo3D(TINY)
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(
        random_torch_state_dict(TINY, np.random.default_rng(0)), TINY))

    res = tuple(args.resolution)
    train_ds = WallTwoViewDataset(n=args.n_train, resolution=res, seed=1)
    test_ds = WallTwoViewDataset(n=args.n_test, resolution=res, seed=999)

    steps = max(1, args.n_train // args.batch_size)
    tcfg = training.Stage1TrainConfig(
        lr=args.lr, epochs=args.epochs, steps_per_epoch=steps,
        warmup_epochs=max(1.0, args.epochs * 0.05), freeze=args.freeze)
    lcfg = train_loop.Stage1LoopConfig(
        epochs=args.epochs, batch_size=args.batch_size,
        eval_freq=max(1, args.epochs // 10), out_dir=args.out)

    t0 = time.time()
    full, history = train_loop.fit(model, params, train_ds,
                                   {"wall": test_ds}, tcfg, lcfg)
    train_s = time.time() - t0

    iou = mask_iou_eval(model, full, test_ds, args.batch_size)
    ckpt = os.path.join(args.out, "stage1_tiny.npz")
    train_loop.save_params_npz(ckpt, full)

    print(json.dumps({
        "metric": "tiny_stage1_heldout_mask_iou",
        "value": round(iou, 4),
        "unit": "IoU",
        "vs_baseline": round(iou / 0.7, 3),   # bar: VERDICT r4 item 4
        "detail": {"epochs": args.epochs, "n_train": args.n_train,
                   "resolution": list(res), "freeze": args.freeze,
                   "lr": args.lr, "train_s": round(train_s, 1),
                   "final_train_loss": history[-1]["train_loss"]
                   if history else None,
                   "ckpt": ckpt},
    }))


if __name__ == "__main__":
    main()
