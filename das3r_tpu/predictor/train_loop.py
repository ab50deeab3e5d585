"""Stage-1 training loop: epochs, evaluation, checkpointing, JSON-line logs
— the host orchestration around ``training.make_train_step`` (reference
dynamic_predictor/dust3r/training.py:173-556: train/train_one_epoch/
test_one_epoch, auto-resume from checkpoint-last, best-checkpoint selection
on test loss, ``log.txt`` JSON lines).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D
from das3r_tpu.predictor import training
from das3r_tpu.predictor.datasets import batch_iterator
from das3r_tpu.predictor.losses import Stage1Batch


@dataclasses.dataclass
class Stage1LoopConfig:
    epochs: int = 50
    batch_size: int = 8
    eval_freq: int = 1          # epochs between test passes
    save_freq: int = 1          # epochs between checkpoint-last saves
    out_dir: str = "stage1_ckpt"
    seed: int = 777


def _save_ckpt(path, train_params, opt_state, epoch, best):
    flat, _ = jax.tree_util.tree_flatten_with_path(
        {"params": train_params, "mu": opt_state.mu, "nu": opt_state.nu})
    data = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    data["__count"] = np.asarray(opt_state.count)
    data["__epoch"] = np.asarray(epoch)
    data["__best"] = np.asarray(best)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **data)


def _load_ckpt(path, train_params, opt_state):
    data = np.load(path)
    def restore(tree, prefix):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = [jnp.asarray(data[f"['{prefix}']" + jax.tree_util.keystr(k)])
                  for k, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    params = restore(train_params, "params")
    opt = training.AdamWState(
        count=jnp.asarray(data["__count"]),
        mu=restore(opt_state.mu, "mu"),
        nu=restore(opt_state.nu, "nu"))
    return params, opt, int(data["__epoch"]), float(data["__best"])


def evaluate(model, params, dataset, batch_size, max_batches=None):
    """Mean total loss over a dataset (test_one_epoch, training.py:497-556)."""
    apply = jax.jit(lambda p, i1, i2: model.apply(
        {"params": p}, i1, i2, stop_trunk_grad=True, deterministic=True))
    from das3r_tpu.predictor.losses import conf_regr3d_mmask_loss
    losses = []
    for bi, (img1, img2, batch) in enumerate(
            batch_iterator(dataset, batch_size, seed=0, shuffle=False)):
        if max_batches and bi >= max_batches:
            break
        res1, res2 = apply(params, jnp.asarray(img1), jnp.asarray(img2))
        out = conf_regr3d_mmask_loss(batch, res1, res2)
        losses.append(out.total)
    if not losses:
        return float("nan")
    return float(np.asarray(jnp.stack(losses)).mean())


def fit(model: AsymmetricCroCo3D, params: dict, train_dataset,
        test_datasets: dict, train_cfg: training.Stage1TrainConfig,
        loop_cfg: Stage1LoopConfig, mesh=None, progress=print):
    """Train the mask heads. Returns (full params dict, history)."""
    train_p, frozen_p = training.split_params(params)
    opt = training.adamw_init(train_p)
    step_fn = training.make_train_step(model, train_cfg, mesh=mesh)

    start_epoch = 0
    best = float("inf")
    last_path = os.path.join(loop_cfg.out_dir, "checkpoint-last.npz")
    if os.path.exists(last_path):   # auto-resume (training.py:189-192)
        train_p, opt, start_epoch, best = _load_ckpt(last_path, train_p, opt)
        progress(f"resumed from {last_path} at epoch {start_epoch}")

    os.makedirs(loop_cfg.out_dir, exist_ok=True)
    log_path = os.path.join(loop_cfg.out_dir, "log.txt")
    history = []
    global_step = start_epoch * max(
        1, len(train_dataset) // loop_cfg.batch_size)

    for epoch in range(start_epoch, loop_cfg.epochs):
        t0 = time.perf_counter()
        handles = []
        for img1, img2, batch in batch_iterator(
                train_dataset, loop_cfg.batch_size,
                seed=loop_cfg.seed + epoch):
            train_p, opt, out = step_fn(
                train_p, frozen_p, opt, jnp.asarray(img1),
                jnp.asarray(img2), batch, jnp.asarray(global_step))
            handles.append(out.total)
            global_step += 1
        train_loss = (float(np.asarray(jnp.stack(handles)).mean())
                      if handles else float("nan"))

        entry = {"epoch": epoch, "train_loss": train_loss,
                 "train_lr": float(training.lr_at(
                     jnp.asarray(float(global_step)), train_cfg)),
                 "time_s": round(time.perf_counter() - t0, 2)}

        if test_datasets and (epoch + 1) % loop_cfg.eval_freq == 0:
            merged = training.merge_params(train_p, frozen_p)
            for name, ds in test_datasets.items():
                entry[f"test_{name}_loss"] = evaluate(
                    model, merged, ds, loop_cfg.batch_size, max_batches=8)
            test_key = next(iter(test_datasets))
            tl = entry[f"test_{test_key}_loss"]
            if tl < best:   # best-checkpoint on test loss (training.py:305+)
                best = tl
                _save_ckpt(os.path.join(loop_cfg.out_dir,
                                        "checkpoint-best.npz"),
                           train_p, opt, epoch + 1, best)

        if (epoch + 1) % loop_cfg.save_freq == 0:
            _save_ckpt(last_path, train_p, opt, epoch + 1, best)

        with open(log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        progress(f"epoch {epoch}: {entry}")
        history.append(entry)

    _save_ckpt(os.path.join(loop_cfg.out_dir, "checkpoint-final.npz"),
               train_p, opt, loop_cfg.epochs, best)
    return training.merge_params(train_p, frozen_p), history
