"""Stage-1 datasets + training loop: iteration, combinators, PointOdyssey
disk format, fit/resume/best-checkpoint."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.models.croco.convert import convert_torch_state_dict
from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D
from das3r_tpu.predictor import datasets as ds_mod
from das3r_tpu.predictor import train_loop, training
from das3r_tpu.models.croco.testkit import TINY, random_torch_state_dict


class TestDatasets:
    def test_synthetic_batches(self):
        ds = ds_mod.SyntheticTwoViewDataset(n=10, resolution=(64, 48))
        batches = list(ds_mod.batch_iterator(ds, 4, seed=0))
        assert len(batches) == 2  # drop_last
        img1, img2, batch = batches[0]
        assert img1.shape == (4, 3, 48, 64)
        assert batch.gt_pts3d_1.shape == (4, 48, 64, 3)
        assert batch.valid_1.dtype == bool

    def test_combinators(self):
        a = ds_mod.SyntheticTwoViewDataset(n=3, seed=1)
        b = ds_mod.SyntheticTwoViewDataset(n=2, seed=2)
        rep = ds_mod.RepeatedDataset(a, 7)
        assert len(rep) == 7
        cat = ds_mod.ConcatDataset(a, b)
        assert len(cat) == 5
        _ = cat[4]  # from b
        _ = cat[0]  # from a

    def test_pointodyssey_format(self, tmp_path):
        """Write a tiny sequence in the PointOdyssey layout and load it."""
        import cv2
        seq = tmp_path / "train" / "seq0"
        for sub in ("rgbs", "depths", "trajs_3d", "extrinsics",
                    "intrinsics"):
            (seq / sub).mkdir(parents=True)
        rng = np.random.default_rng(0)
        n_pts = 50
        traj_static = rng.uniform(-1, 1, (n_pts, 3)) + [0, 0, 5]
        for f in range(4):
            img = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
            cv2.imwrite(str(seq / "rgbs" / f"rgb_{f:05d}.jpg"), img)
            depth_m = rng.uniform(2, 8, (48, 64))
            d16 = (depth_m / 1000.0 * 65535.0).astype(np.uint16)
            cv2.imwrite(str(seq / "depths" / f"depth_{f:05d}.png"), d16)
            K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
            np.save(seq / "intrinsics" / f"intrinsic_{f:05d}.npy", K)
            ext = np.eye(4)
            ext[:3, 3] = [0.01 * f, 0, 0]
            np.save(seq / "extrinsics" / f"extrinsic_{f:05d}.npy", ext)
            traj = traj_static.copy()
            traj[:10] += 0.1 * f  # first 10 points move
            np.save(seq / "trajs_3d" / f"traj_3d_{f:05d}.npy", traj)

        ds = ds_mod.PointOdysseyDataset(str(tmp_path), "train",
                                        strides=(1, 2), clip_step=1,
                                        resolution=(64, 48),
                                        dist_type=None)
        assert len(ds) > 0
        clip = ds[0]
        assert clip.img1.shape == (3, 48, 64)
        assert clip.gt_pts3d_1.shape == (48, 64, 3)
        assert clip.valid_1.any()
        # moving trajectory points produce a nonzero dynamic mask
        assert clip.gt_mask_1.max() == 1.0
        # depth decoding: 16-bit png * 1000 / 65535 round trip
        assert 1.5 < clip.gt_pts3d_1[..., 2][clip.valid_1].mean() < 9.0


class TestFitLoop:
    @pytest.mark.slow
    def test_fit_resume_and_best(self, tmp_path):
        model = AsymmetricCroCo3D(TINY)
        rng = np.random.default_rng(1)
        params = jax.tree.map(jnp.asarray, convert_torch_state_dict(
            random_torch_state_dict(TINY, rng), TINY))
        train_ds = ds_mod.SyntheticTwoViewDataset(n=4, resolution=(48, 32))
        test_ds = ds_mod.SyntheticTwoViewDataset(n=2, resolution=(48, 32),
                                                 seed=9)
        tcfg = training.Stage1TrainConfig(lr=1e-3, warmup_epochs=0.0,
                                          steps_per_epoch=2, epochs=4)
        lcfg = train_loop.Stage1LoopConfig(
            epochs=2, batch_size=2, out_dir=str(tmp_path / "ck"))
        merged, hist = train_loop.fit(
            model, params, train_ds, {"syn": test_ds}, tcfg, lcfg,
            progress=lambda *_: None)
        assert len(hist) == 2
        assert os.path.exists(str(tmp_path / "ck" / "checkpoint-last.npz"))
        assert os.path.exists(str(tmp_path / "ck" / "checkpoint-final.npz"))
        assert os.path.exists(str(tmp_path / "ck" / "checkpoint-best.npz"))
        log_lines = open(str(tmp_path / "ck" / "log.txt")).read().splitlines()
        assert len(log_lines) == 2
        entry = json.loads(log_lines[-1])
        assert "train_loss" in entry and "test_syn_loss" in entry

        # resume: epochs=3 continues from epoch 2 (runs exactly 1 more)
        lcfg3 = train_loop.Stage1LoopConfig(
            epochs=3, batch_size=2, out_dir=str(tmp_path / "ck"))
        merged2, hist2 = train_loop.fit(
            model, params, train_ds, {}, tcfg, lcfg3,
            progress=lambda *_: None)
        assert len(hist2) == 1
        assert json.loads(open(str(tmp_path / "ck" / "log.txt"))
                          .read().splitlines()[-1])["epoch"] == 2

    @pytest.mark.slow
    def test_pose_eval_hook_and_keep_ckpts(self, tmp_path):
        """In-train pose eval (training.py:311-331): fires every
        pose_eval_freq epochs, tracks best mean ATE, saves best_pose and
        numbered keep checkpoints; a None ATE (the reference 'bug' flag)
        never updates the best."""
        model = AsymmetricCroCo3D(TINY)
        rng = np.random.default_rng(2)
        params = jax.tree.map(jnp.asarray, convert_torch_state_dict(
            random_torch_state_dict(TINY, rng), TINY))
        train_ds = ds_mod.SyntheticTwoViewDataset(n=4, resolution=(48, 32))
        test_ds = ds_mod.SyntheticTwoViewDataset(n=2, resolution=(48, 32),
                                                 seed=9)
        tcfg = training.Stage1TrainConfig(lr=1e-3, warmup_epochs=0.0,
                                          steps_per_epoch=2, epochs=4)
        calls = []
        ates = {1: 0.5, 2: 0.2, 3: None, 4: 0.4}  # 3 fails, 4 not better

        def pose_eval_fn(full_params, epoch):
            calls.append(epoch)
            assert "params" not in full_params or True
            return {"mean_ate": ates[epoch], "n_ok": 1}

        lcfg = train_loop.Stage1LoopConfig(
            epochs=4, batch_size=2, out_dir=str(tmp_path / "pk"),
            pose_eval_freq=1, keep_freq=2, save_best_pose=True)
        _, hist = train_loop.fit(
            model, params, train_ds, {"syn": test_ds}, tcfg, lcfg,
            progress=lambda *_: None, pose_eval_fn=pose_eval_fn)
        assert calls == [1, 2, 3, 4]
        assert os.path.exists(str(tmp_path / "pk" /
                                  "checkpoint-best_pose.npz"))
        assert os.path.exists(str(tmp_path / "pk" / "checkpoint-2.npz"))
        assert os.path.exists(str(tmp_path / "pk" / "checkpoint-4.npz"))
        # best ATE (0.2, epoch 2) persisted into checkpoint-last and the
        # final entry logged the eval fields incl. the failed epoch
        data = np.load(str(tmp_path / "pk" / "checkpoint-last.npz"))
        assert float(data["__best_pose"]) == 0.2
        assert hist[-1]["pose_mean_ate"] == 0.4
        assert hist[2]["pose_mean_ate"] is None
        # median-based best selection logged both loss and loss_med
        assert "test_syn_loss_med" in hist[-1]
