"""Stage-1 mask-head training: loss semantics + a short training run that
must drive the mask heads toward synthetic GT masks while leaving the
frozen trunk untouched."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.models.croco.convert import convert_torch_state_dict
from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D
from das3r_tpu.predictor import training as s1train
from das3r_tpu.predictor.losses import (Stage1Batch, bce,
                                        conf_regr3d_mmask_loss,
                                        normalize_pointcloud_pair)
from das3r_tpu.models.croco.testkit import TINY, random_torch_state_dict


def make_batch(rng, b=2, h=32, w=48):
    pts1 = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32) + [0, 0, 4]
    pts2 = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32) + [0, 0, 4]
    pose1 = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    pose1[:, :3, 3] = rng.normal(0, 0.1, (b, 3))
    mask1 = (rng.uniform(0, 1, (b, h, w)) > 0.8).astype(np.float32)
    mask2 = (rng.uniform(0, 1, (b, h, w)) > 0.8).astype(np.float32)
    return Stage1Batch(
        gt_pts3d_1=jnp.asarray(pts1), gt_pts3d_2=jnp.asarray(pts2),
        camera_pose_1=jnp.asarray(pose1),
        valid_1=jnp.ones((b, h, w), bool), valid_2=jnp.ones((b, h, w), bool),
        gt_mask_1=jnp.asarray(mask1), gt_mask_2=jnp.asarray(mask2))


class TestLossSemantics:
    def test_normalize_pair_joint(self):
        rng = np.random.default_rng(0)
        p1 = jnp.asarray(rng.uniform(1, 2, (2, 4, 4, 3)), jnp.float32)
        p2 = jnp.asarray(rng.uniform(1, 2, (2, 4, 4, 3)), jnp.float32)
        v = jnp.ones((2, 4, 4), bool)
        n1, n2 = normalize_pointcloud_pair(p1, p2, v, v)
        d = np.concatenate([
            np.linalg.norm(np.asarray(n1), axis=-1).reshape(2, -1),
            np.linalg.norm(np.asarray(n2), axis=-1).reshape(2, -1)], 1)
        np.testing.assert_allclose(d.mean(1), 1.0, rtol=1e-5)

    def test_bce_matches_torch(self):
        import torch
        rng = np.random.default_rng(1)
        p = rng.uniform(0.01, 0.99, (64,)).astype(np.float32)
        t = (rng.uniform(0, 1, 64) > 0.5).astype(np.float32)
        ours = np.asarray(bce(jnp.asarray(p), jnp.asarray(t)))
        theirs = torch.nn.functional.binary_cross_entropy(
            torch.from_numpy(p), torch.from_numpy(t),
            reduction="none").numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_conf_weighting_direction(self):
        """Higher confidence must amplify the pixel loss term."""
        rng = np.random.default_rng(2)
        batch = make_batch(rng)
        b, h, w = batch.gt_mask_1.shape
        res_lo = {
            "pts3d": batch.gt_pts3d_1 + 1.0,
            "conf": jnp.full((b, h, w), 1.5),
            "dynamic_mask": jnp.full((b, h, w), 0.5)}
        res2 = {
            "pts3d_in_other_view": batch.gt_pts3d_2,
            "conf": jnp.full((b, h, w), 1.5),
            "dynamic_mask": jnp.full((b, h, w), 0.5)}
        lo = conf_regr3d_mmask_loss(batch, res_lo, res2)
        res_hi = dict(res_lo, conf=jnp.full((b, h, w), 5.0))
        hi = conf_regr3d_mmask_loss(batch, res_hi, res2)
        assert float(hi.total) > float(lo.total)


class TestTrainStep:
    def test_mask_heads_learn_frozen_trunk_fixed(self):
        rng = np.random.default_rng(3)
        model = AsymmetricCroCo3D(TINY)
        params = jax.tree.map(
            jnp.asarray, convert_torch_state_dict(
                random_torch_state_dict(TINY, rng), TINY))
        train_p, frozen_p = s1train.split_params(params)
        assert set(train_p) == set(s1train.TRAINABLE_KEYS)

        cfg = s1train.Stage1TrainConfig(lr=1e-3, warmup_epochs=0.0,
                                        steps_per_epoch=10, epochs=10)
        step = s1train.make_train_step(model, cfg)
        opt = s1train.adamw_init(train_p)

        img1 = jnp.asarray(rng.standard_normal((2, 3, 32, 48)), jnp.float32)
        img2 = jnp.asarray(rng.standard_normal((2, 3, 32, 48)), jnp.float32)
        batch = make_batch(rng, b=2, h=32, w=48)

        losses = []
        frozen_before = jax.tree.map(lambda x: x, frozen_p)
        for i in range(8):
            train_p, opt, out = step(train_p, frozen_p, opt, img1, img2,
                                     batch, jnp.asarray(i))
            losses.append(float(out.mask_1 + out.mask_2))
        # the mask BCE must go down (pts3d heads are frozen so their loss
        # term is constant)
        assert losses[-1] < losses[0]
        # frozen params bitwise untouched
        for a, b in zip(jax.tree.leaves(frozen_before),
                        jax.tree.leaves(frozen_p)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sharded_step_matches_single(self):
        from das3r_tpu.parallel import make_mesh
        rng = np.random.default_rng(4)
        model = AsymmetricCroCo3D(TINY)
        params = jax.tree.map(
            jnp.asarray, convert_torch_state_dict(
                random_torch_state_dict(TINY, rng), TINY))
        train_p, frozen_p = s1train.split_params(params)
        cfg = s1train.Stage1TrainConfig(lr=1e-3, warmup_epochs=0.0)
        img1 = jnp.asarray(rng.standard_normal((4, 3, 32, 48)), jnp.float32)
        img2 = jnp.asarray(rng.standard_normal((4, 3, 32, 48)), jnp.float32)
        batch = make_batch(rng, b=4, h=32, w=48)

        step1 = s1train.make_train_step(model, cfg)
        p1, _, out1 = step1(train_p, frozen_p, s1train.adamw_init(train_p),
                            img1, img2, batch, jnp.asarray(0))

        mesh = make_mesh(data=4, tile=2)
        with jax.sharding.set_mesh(mesh):
            stepN = s1train.make_train_step(model, cfg, mesh=mesh)
            pN, _, outN = stepN(train_p, frozen_p,
                                s1train.adamw_init(train_p),
                                img1, img2, batch, jnp.asarray(0))
        assert float(out1.total) == pytest.approx(float(outN.total),
                                                  rel=1e-5)
        a = jax.tree.leaves(p1)[0]
        b = jax.tree.leaves(pN)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
