"""End-to-end integration: synthetic stage-1 dir -> rearrange -> load ->
init -> short training run -> artifacts + PSNR improves."""
import os

import numpy as np
import pytest

from das3r_tpu.data import readers, rearrange
from das3r_tpu.data.synthetic import make_synthetic_stage1_dir
from das3r_tpu.train import checkpoint as ckpt
from das3r_tpu.train import scene_setup, trainer
from das3r_tpu.train.config import OptimizationConfig


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    src = str(root / "seq")
    make_synthetic_stage1_dir(src, n_frames=12, height=48, width=64)
    rearrange.rearrange_scene(src, src + "_rearranged")
    return src + "_rearranged"


def test_full_training_run(scene_dir, tmp_path):
    data = readers.load_scene(scene_dir, eval_mode=True)
    assert len(data.test_idx) == 1 and len(data.train_idx) == 11
    bundle = scene_setup.build_scene(data, sh_degree=3, conf_thre=1.0,
                                     max_per_tile=512,
                                     max_tiles_per_gaussian=16)
    cfg = OptimizationConfig(iterations=40, psnr_threshold=5.0)
    model_path = str(tmp_path / "model")
    result = trainer.train_scene(
        bundle, cfg, model_path=model_path,
        testing_iterations={20, 40}, saving_iterations={40},
        checkpoint_iterations={40}, log_every=20,
        progress=lambda *_: None)

    assert np.isfinite(result.last_loss)
    assert result.test_psnr is not None and result.test_psnr > 5.0
    # artifacts
    assert os.path.exists(os.path.join(
        model_path, "point_cloud", "iteration_40", "point_cloud.ply"))
    assert os.path.exists(os.path.join(model_path, "pose", "pose_40.npy"))
    assert os.path.exists(os.path.join(model_path, "chkpnt40.npz"))
    log = open(os.path.join(model_path, "test_log.txt")).read()
    assert "[ITER 40] Evaluating test: L1 " in log

    # checkpoint roundtrip
    loaded = ckpt.load_train_state(
        os.path.join(model_path, "chkpnt40.npz"), result.state)
    np.testing.assert_allclose(np.asarray(loaded.params.xyz),
                               np.asarray(result.state.params.xyz))
    assert int(loaded.step) == 40

    # pose npy schema: [F, 4, 4] w2c
    poses = np.load(os.path.join(model_path, "pose", "pose_40.npy"))
    assert poses.shape == (11, 4, 4)
    np.testing.assert_allclose(poses[:, 3], np.tile([0, 0, 0, 1], (11, 1)),
                               atol=1e-6)


def test_training_improves_on_static_scene(scene_dir, tmp_path):
    """Longer run on the train split only: loss must drop substantially."""
    data = readers.load_scene(scene_dir, eval_mode=False)
    bundle = scene_setup.build_scene(data, sh_degree=0, conf_thre=1.0,
                                     max_per_tile=512,
                                     max_tiles_per_gaussian=16)
    cfg = OptimizationConfig(iterations=120, psnr_threshold=15.0)
    losses = []
    result = trainer.train_scene(
        bundle, cfg, model_path=None, log_every=10,
        progress=lambda msg: losses.append(
            float(msg.split("loss ")[1].split(" ")[0])))
    # the moving object sets a loss floor for a static model; require a
    # solid drop rather than a specific ratio
    assert losses[-1] < losses[0] * 0.8
