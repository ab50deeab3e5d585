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
    pose_eval_freq: int = 0     # epochs between in-train pose evals
                                # (reference training.py:311-331); 0 = off
    keep_freq: int = 0          # epochs between numbered keep-checkpoints
    save_best_pose: bool = False  # save checkpoint-best_pose.npz on new
                                  # best mean ATE (training.py:352-353)
    out_dir: str = "stage1_ckpt"
    seed: int = 777
    tensorboard: bool = False   # TB scalars next to the JSON lines


def _save_ckpt(path, train_params, opt_state, epoch, best,
               best_pose_ate=float("inf")):
    flat, _ = jax.tree_util.tree_flatten_with_path(
        {"params": train_params, "mu": opt_state.mu, "nu": opt_state.nu})
    data = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    data["__count"] = np.asarray(opt_state.count)
    data["__epoch"] = np.asarray(epoch)
    data["__best"] = np.asarray(best)
    data["__best_pose"] = np.asarray(best_pose_ate)
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
    best_pose = (float(data["__best_pose"]) if "__best_pose" in data
                 else float("inf"))
    return (params, opt, int(data["__epoch"]), float(data["__best"]),
            best_pose)


def save_params_npz(path: str, params: dict) -> None:
    """Full parameter tree -> one npz (keystr-keyed); the stage-1 ckpt
    format quality_e2e --stage1_ckpt consumes."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **{jax.tree_util.keystr(k): np.asarray(v)
                                 for k, v in flat})


def load_params_npz(path: str, template: dict) -> dict:
    """Inverse of ``save_params_npz`` (template gives the tree shape)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def evaluate_stats(model, params, dataset, batch_size, max_batches=None):
    """Per-dataset test stats (test_one_epoch, training.py:497-556):
    ``loss`` = mean over batches, ``loss_med`` = median — the reference
    selects the best checkpoint on the MEDIAN (training.py:307-308)."""
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
        return {"loss": float("nan"), "loss_med": float("nan")}
    arr = np.asarray(jnp.stack(losses))
    return {"loss": float(arr.mean()), "loss_med": float(np.median(arr))}


def evaluate(model, params, dataset, batch_size, max_batches=None):
    """Mean total loss over a dataset (back-compat wrapper)."""
    return evaluate_stats(model, params, dataset, batch_size,
                          max_batches)["loss"]


def fit(model: AsymmetricCroCo3D, params: dict, train_dataset,
        test_datasets: dict, train_cfg: training.Stage1TrainConfig,
        loop_cfg: Stage1LoopConfig, mesh=None, progress=print,
        pose_eval_fn=None):
    """Train the mask heads. Returns (full params dict, history).

    ``pose_eval_fn(full_params, epoch) -> dict`` is the in-train pose
    evaluation hook (reference training.py:311-331 runs
    ``eval_pose_estimation`` every ``pose_eval_freq`` epochs): it must
    return at least ``{"mean_ate": float | None}`` — ``None`` marks a
    failed eval (the reference's ``bug`` flag) and never updates the best.
    Wire ``das3r_tpu.eval.pose_eval.eval_pose_estimation`` here when real
    dataset roots are available.
    """
    train_p, frozen_p = training.split_params(
        params, freeze=train_cfg.freeze)
    opt = training.adamw_init(train_p)
    step_fn = training.make_train_step(model, train_cfg, mesh=mesh)

    start_epoch = 0
    best = float("inf")
    best_pose_ate = float("inf")
    last_path = os.path.join(loop_cfg.out_dir, "checkpoint-last.npz")
    if os.path.exists(last_path):   # auto-resume (training.py:189-192)
        train_p, opt, start_epoch, best, best_pose_ate = _load_ckpt(
            last_path, train_p, opt)
        progress(f"resumed from {last_path} at epoch {start_epoch}")

    os.makedirs(loop_cfg.out_dir, exist_ok=True)
    log_path = os.path.join(loop_cfg.out_dir, "log.txt")
    # wandb-equivalent scalar stream (reference training.py:177-183,
    # 266-269) — guarded TensorBoard next to the JSON lines
    from das3r_tpu.utils import tblog
    tb = tblog.make_writer(os.path.join(loop_cfg.out_dir, "tb")
                           if loop_cfg.tensorboard else None)
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

        ep1 = epoch + 1
        if test_datasets and ep1 % loop_cfg.eval_freq == 0:
            merged = training.merge_params(train_p, frozen_p)
            new_best = False
            for name, ds in test_datasets.items():
                stats = evaluate_stats(
                    model, merged, ds, loop_cfg.batch_size, max_batches=8)
                entry[f"test_{name}_loss"] = stats["loss"]
                entry[f"test_{name}_loss_med"] = stats["loss_med"]
                # best over ALL test sets, on the MEDIAN loss
                # (training.py:307-308)
                if stats["loss_med"] < best:
                    best = stats["loss_med"]
                    new_best = True
            if new_best:
                _save_ckpt(os.path.join(loop_cfg.out_dir,
                                        "checkpoint-best.npz"),
                           train_p, opt, ep1, best, best_pose_ate)

        if (pose_eval_fn is not None and loop_cfg.pose_eval_freq > 0
                and ep1 % loop_cfg.pose_eval_freq == 0):
            # in-train pose eval (training.py:311-331)
            merged = training.merge_params(train_p, frozen_p)
            pose_stats = pose_eval_fn(merged, ep1)
            ate = pose_stats.get("mean_ate")
            entry.update({f"pose_{k}": v for k, v in pose_stats.items()})
            if ate is not None and ate < best_pose_ate:
                best_pose_ate = ate
                if loop_cfg.save_best_pose:
                    _save_ckpt(os.path.join(loop_cfg.out_dir,
                                            "checkpoint-best_pose.npz"),
                               train_p, opt, ep1, best, best_pose_ate)

        if loop_cfg.keep_freq and ep1 % loop_cfg.keep_freq == 0:
            # numbered keep-checkpoints (training.py:346-348)
            _save_ckpt(os.path.join(loop_cfg.out_dir,
                                    f"checkpoint-{ep1}.npz"),
                       train_p, opt, ep1, best, best_pose_ate)

        if ep1 % loop_cfg.save_freq == 0:
            _save_ckpt(last_path, train_p, opt, ep1, best, best_pose_ate)

        with open(log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        tblog.scalars(tb, ep1, **{k.replace("test_", "test__").replace(
            "train_", "train__").replace("pose_", "pose__"): v
            for k, v in entry.items()
            if isinstance(v, (int, float)) and k != "epoch"})
        progress(f"epoch {epoch}: {entry}")
        history.append(entry)

    _save_ckpt(os.path.join(loop_cfg.out_dir, "checkpoint-final.npz"),
               train_p, opt, loop_cfg.epochs, best, best_pose_ate)
    tblog.close(tb)
    return training.merge_params(train_p, frozen_p), history
