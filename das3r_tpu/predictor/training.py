"""Stage-1 trainer: fine-tune the dynamic-mask DPT heads on two-view batches.

TPU-native replacement for the reference's DDP trainer
(dynamic_predictor/dust3r/training.py:173-494): instead of
torch DDP + NCCL all-reduce, the jitted step is data-parallel over a
``jax.sharding Mesh`` 'data' axis (XLA inserts the gradient all-reduce),
and parameter partitioning replaces ``freeze='encoder_and_3d_predictor'``
(model.py:96-106) — only the two mask heads receive updates.

Optimizer: AdamW(beta2=0.95, weight_decay 0.05) with per-iteration cosine
lr + linear warmup (croco misc.adjust_learning_rate semantics; recipe
DAS3R_b32_g4.sh: lr 5e-5, 50 epochs, bs 8 x 4 GPUs).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D
from das3r_tpu.predictor.losses import (Stage1Batch, Stage1LossOut,
                                        conf_regr3d_mmask_loss)

TRAINABLE_KEYS = ("downstream_head_dynamic_mask1",
                  "downstream_head_dynamic_mask2")


@dataclasses.dataclass(frozen=True)
class Stage1TrainConfig:
    lr: float = 5e-5
    min_lr: float = 1e-8
    warmup_epochs: float = 1.0
    epochs: int = 50
    steps_per_epoch: int = 1250   # 10_000 samples / (8 * 1) default
    weight_decay: float = 0.05
    b1: float = 0.9
    b2: float = 0.95
    eps: float = 1e-8
    alpha: float = 0.2            # ConfLoss alpha
    # Parameter freeze set (reference model.py:96-106 freeze choices):
    # "encoder_and_3d_predictor" = DAS3R recipe, only the mask heads
    # train; "none" = train everything (the from-scratch option for
    # environments without the MonST3R pretrained trunk).
    freeze: str = "encoder_and_3d_predictor"


def split_params(params: dict, freeze: str = "encoder_and_3d_predictor"):
    """(trainable params, frozen params) per the freeze set."""
    if freeze == "none":
        return dict(params), {}
    train = {k: v for k, v in params.items() if k in TRAINABLE_KEYS}
    frozen = {k: v for k, v in params.items() if k not in TRAINABLE_KEYS}
    return train, frozen


def merge_params(train: dict, frozen: dict) -> dict:
    return {**frozen, **train}


class AdamWState(NamedTuple):
    count: jax.Array
    mu: dict
    nu: dict


def adamw_init(params) -> AdamWState:
    return AdamWState(count=jnp.zeros((), jnp.int32),
                      mu=jax.tree.map(jnp.zeros_like, params),
                      nu=jax.tree.map(jnp.zeros_like, params))


def adamw_step(params, grads, state: AdamWState, lr,
               cfg: Stage1TrainConfig):
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1 - cfg.b1 ** c
    bc2 = 1 - cfg.b2 ** c
    new_mu = jax.tree.map(lambda m, g: cfg.b1 * m + (1 - cfg.b1) * g,
                          state.mu, grads)
    new_nu = jax.tree.map(lambda v, g: cfg.b2 * v + (1 - cfg.b2) * g * g,
                          state.nu, grads)
    new_p = jax.tree.map(
        lambda p, m, v: p - lr * ((m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps)
                                  + cfg.weight_decay * p),
        params, new_mu, new_nu)
    return new_p, AdamWState(count, new_mu, new_nu)


def lr_at(step, cfg: Stage1TrainConfig):
    """Per-iteration warmup + half-cosine (croco misc.adjust_learning_rate)."""
    epoch = step / cfg.steps_per_epoch
    warm = cfg.lr * epoch / jnp.maximum(cfg.warmup_epochs, 1e-8)
    t = (epoch - cfg.warmup_epochs) / jnp.maximum(
        cfg.epochs - cfg.warmup_epochs, 1e-8)
    cos = cfg.min_lr + (cfg.lr - cfg.min_lr) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * jnp.clip(t, 0.0, 1.0)))
    return jnp.where(epoch < cfg.warmup_epochs, warm, cos)


def make_train_step(model: AsymmetricCroCo3D, cfg: Stage1TrainConfig,
                    mesh=None):
    """Returns jitted step(train_params, frozen_params, opt_state, batch,
    img1, img2, step_no) -> (train_params, opt_state, Stage1LossOut).

    With ``mesh`` given, the batch dimension is sharded over the 'data' axis
    (the DDP equivalent); parameters are replicated.
    """

    def loss_fn(train_params, frozen_params, img1, img2,
                batch: Stage1Batch):
        params = merge_params(train_params, frozen_params)
        res1, res2 = model.apply({"params": params}, img1, img2,
                                 stop_trunk_grad=(cfg.freeze != "none"),
                                 deterministic=True)
        out = conf_regr3d_mmask_loss(batch, res1, res2, alpha=cfg.alpha)
        return out.total, out

    def step(train_params, frozen_params, opt_state, img1, img2, batch,
             step_no):
        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_params, frozen_params, img1, img2, batch)
        lr = lr_at(step_no.astype(jnp.float32), cfg)
        new_params, new_state = adamw_step(train_params, grads, opt_state,
                                           lr, cfg)
        return new_params, new_state, out

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        batch_sh = Stage1Batch(*([bsh] * len(Stage1Batch._fields)))
        return jax.jit(step, in_shardings=(
            rep, rep, rep, bsh, bsh, batch_sh, rep),
            out_shardings=(rep, rep, rep))
    return jax.jit(step)
