"""The COMPLETE DAS3R pipeline, hermetically: synthetic video -> stage-1
(tiny random-weight predictor -> pairwise inference -> global alignment ->
artifact dir) -> rearrange bridge -> stage-2 loader -> Gaussian init ->
training steps. Verifies plumbing and artifact schemas end-to-end."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.data import readers, rearrange
from das3r_tpu.data.synthetic import make_synthetic_stage1_dir
from das3r_tpu.models.croco.convert import convert_torch_state_dict
from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D, Dust3rConfig
from das3r_tpu.predictor import alignment, runner
from das3r_tpu.train import scene_setup, trainer
from das3r_tpu.train.config import OptimizationConfig
from das3r_tpu.models.croco.testkit import TINY, random_torch_state_dict


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    """Synthetic frames (reuse the stage-1 fixture's rendered images)."""
    root = tmp_path_factory.mktemp("video")
    src = str(root / "gen")
    make_synthetic_stage1_dir(src, n_frames=6, height=48, width=64)
    img_dir = str(root / "frames")
    os.makedirs(img_dir)
    import shutil
    from pathlib import Path
    for p in sorted(Path(src).glob("frame_*.png")):
        shutil.copy(p, img_dir)
    return img_dir


def test_stage1_to_stage2_full_pipeline(video_dir, tmp_path):
    model = AsymmetricCroCo3D(TINY)
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        jnp.asarray, convert_torch_state_dict(
            random_torch_state_dict(TINY, rng), TINY))

    stage1_dir = str(tmp_path / "stage1_out")
    cfg = alignment.AlignerConfig(niter=12, flow_loss_weight=0.0)
    result = runner.run_scene(
        video_dir, stage1_dir, model, params,
        scene_graph="swin-2-noncyclic", aligner_cfg=cfg, size=64,
        verbose=lambda *_: None)
    assert result.n_frames == 6
    scene1 = result.scene
    assert scene1.depths.shape[0] == 6
    assert np.isfinite(scene1.depths).all()
    assert np.isfinite(scene1.poses_c2w).all()

    # artifact files exist in the stage-1 flat layout
    for f in ("frame_0000.png", "frame_0000.npy", "conf_0000.npy",
              "dyna_avg_0000.npy", "dyna_max_0000.npy",
              "dynamic_mask_0000.png", "pred_traj.txt",
              "pred_intrinsics.txt"):
        assert os.path.exists(os.path.join(stage1_dir, f)), f

    # bridge -> stage-2 loader -> init -> train a few steps
    rearranged = stage1_dir + "_rearranged"
    rearrange.rearrange_scene(stage1_dir, rearranged)
    data = readers.load_scene(rearranged, eval_mode=False)
    assert data.n_frames == 6
    # stage-1 frames are cropped to /16 multiples of the 64-px resize
    bundle = scene_setup.build_scene(data, sh_degree=0, conf_thre=1.0,
                                     max_per_tile=256,
                                     max_tiles_per_gaussian=16)
    out = trainer.train_scene(
        bundle, OptimizationConfig(iterations=6, psnr_threshold=0.0),
        model_path=None, log_every=3, progress=lambda *_: None)
    assert np.isfinite(out.last_loss)
