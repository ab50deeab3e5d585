"""Eval/harness tooling tests: depth metrics, log scraping, binary format
readers, render tool round trip, sintel dynamic labels."""
import os
import struct

import numpy as np
import pytest

from das3r_tpu.eval import depth as depth_eval
from das3r_tpu.eval import harness


class TestDepthMetrics:
    def test_perfect_depth(self):
        rng = np.random.default_rng(0)
        gt = rng.uniform(1, 10, (4, 32, 32))
        m = depth_eval.depth_metrics(gt.copy(), gt)
        assert m.abs_rel == pytest.approx(0.0, abs=1e-9)
        assert m.delta_1 == 1.0

    def test_scale_shift_alignment_recovers(self):
        rng = np.random.default_rng(1)
        gt = rng.uniform(1, 10, (32, 32))
        pred = gt * 0.37 + 1.2   # affine-transformed depth
        m = depth_eval.depth_metrics(pred, gt, align="scale&shift")
        assert m.abs_rel < 1e-9
        m2 = depth_eval.depth_metrics(pred, gt, align="none")
        assert m2.abs_rel > 0.1

    def test_weiszfeld_scale_robust_to_outliers(self):
        """align_with_scale semantics (depth_eval.py:231-255): the IRLS
        scale must recover the true factor despite gross outliers that
        wreck the plain L2/median ratio less robustly."""
        rng = np.random.default_rng(2)
        gt = rng.uniform(1, 10, (40, 40))
        pred = gt / 2.5
        gt_noisy = gt.copy()
        gt_noisy[:4] = 50.0                  # 10% gross GT outliers (low
        # leverage in s*p - g: their subgradient is p, same as inliers —
        # PRED-side outliers would legitimately dominate the L1 fit)
        clean = depth_eval.depth_metrics(pred, gt, align="scale_weiszfeld")
        assert clean.abs_rel < 1e-9
        aligned = depth_eval.align_depth(
            pred, gt_noisy, np.isfinite(gt_noisy), "scale_weiszfeld")
        assert np.abs(aligned[4:] / gt[4:] - 1).max() < 0.02

    def test_lad_alignment_recovers_affine_with_outliers(self):
        """align_with_lad semantics: L1 scale+shift shrugs off the
        outliers that bias the lstsq fit."""
        rng = np.random.default_rng(3)
        gt = rng.uniform(1, 10, (40, 40))
        pred = gt * 0.4 + 0.7
        gt_noisy = gt.copy()
        gt_noisy[:4] = 80.0                  # GT-side outliers
        a_lad = depth_eval.align_depth(pred, gt_noisy,
                                       np.isfinite(gt_noisy), "lad")
        a_ls = depth_eval.align_depth(pred, gt_noisy,
                                      np.isfinite(gt_noisy), "scale&shift")
        err_lad = np.abs(a_lad[4:] - gt[4:]).mean()
        err_ls = np.abs(a_ls[4:] - gt[4:]).mean()
        assert err_lad < 0.01 and err_lad < err_ls * 0.1

    def test_disp_input_alignment(self):
        """disp_input: a disparity pred off by an affine factor in
        DISPARITY space aligns to near-zero error (depth_eval.py:203-268
        branch); aligning it as if it were depth does not."""
        rng = np.random.default_rng(4)
        gt = rng.uniform(1, 10, (32, 32))
        disp = 1.0 / gt
        pred_disp = disp * 0.3 + 0.05
        m = depth_eval.depth_metrics(pred_disp, gt, align="scale&shift",
                                     disp_input=True)
        assert m.abs_rel < 1e-6
        m2 = depth_eval.depth_metrics(pred_disp, gt, align="scale&shift")
        assert m2.abs_rel > 0.05

    def test_known_error(self):
        gt = np.full((16, 16), 4.0)
        pred = np.full((16, 16), 5.0)
        m = depth_eval.depth_metrics(pred, gt, align="none")
        assert m.abs_rel == pytest.approx(0.25)
        # ratio exactly 1.25 -> not < 1.25, but < 1.25^2
        assert m.delta_1 == 0.0
        assert m.delta_2 == 1.0


class TestScrapers:
    def test_scrape_and_table(self, tmp_path):
        for scene, psnrs in [("sceneA", [20.0, 25.5]), ("sceneB", [30.0])]:
            d = tmp_path / scene
            d.mkdir()
            with open(d / "test_log.txt", "w") as f:
                for i, p in enumerate(psnrs):
                    f.write(f"[ITER {(i+1)*100}] Evaluating test: "
                            f"L1 0.01 PSNR {p}\n")
        table = harness.psnr_table(str(tmp_path), ["sceneA", "sceneB",
                                                   "missing"])
        assert table["sceneA"] == 25.5
        assert table["sceneB"] == 30.0
        assert table["missing"] is None
        assert table["average"] == pytest.approx((25.5 + 30.0) / 2)
        txt = harness.format_psnr_table(table)
        assert "25.50" in txt and "--" in txt


class TestBinaryFormats:
    def test_sintel_cam_roundtrip(self, tmp_path):
        M = np.diag([100.0, 100.0, 1.0])
        N = np.hstack([np.eye(3), np.asarray([[1.], [2.], [3.]])])
        p = tmp_path / "frame_0001.cam"
        with open(p, "wb") as f:
            np.asarray([harness.TAG_FLOAT], np.float32).tofile(f)
            M.astype(np.float64).tofile(f)
            N.astype(np.float64).tofile(f)
        M2, N2 = harness.sintel_cam_read(str(p))
        np.testing.assert_allclose(M2, M)
        np.testing.assert_allclose(N2, N)

    def test_dpt_and_flo(self, tmp_path):
        h, w = 6, 8
        depth = np.random.default_rng(0).uniform(
            1, 5, (h, w)).astype(np.float32)
        p = tmp_path / "d.dpt"
        with open(p, "wb") as f:
            np.asarray([harness.TAG_FLOAT], np.float32).tofile(f)
            np.asarray([w, h], np.int32).tofile(f)
            depth.tofile(f)
        np.testing.assert_allclose(harness.sintel_depth_read(str(p)), depth)

        flow = np.random.default_rng(1).standard_normal(
            (h, w, 2)).astype(np.float32)
        p2 = tmp_path / "f.flo"
        with open(p2, "wb") as f:
            np.asarray([harness.TAG_FLOAT], np.float32).tofile(f)
            np.asarray([w, h], np.int32).tofile(f)
            flow.tofile(f)
        np.testing.assert_allclose(harness.flo_read(str(p2)), flow)


class TestSintelDynamics:
    def test_static_scene_has_no_dynamics(self):
        from das3r_tpu.data.sintel_dynamics import dynamic_label_from_gt
        h, w = 24, 32
        depth = np.full((h, w), 5.0, np.float32)
        K = np.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
        w2c1 = np.eye(4)[:3]
        m2 = np.eye(4)
        m2[:3, 3] = [0.1, 0, 0]   # camera translates; world static
        w2c2 = m2[:3]
        # GT flow == ego flow for a fully static scene
        import jax.numpy as jnp
        from das3r_tpu.predictor import warping
        c2w1 = np.eye(4)
        c2w2 = np.linalg.inv(m2)
        ego, _ = warping.ego_flow_from_disp(
            jnp.asarray(c2w1[None, :3, :3], jnp.float32),
            jnp.asarray(c2w1[None, :3, 3:], jnp.float32),
            jnp.asarray(c2w2[None, :3, :3], jnp.float32),
            jnp.asarray(c2w2[None, :3, 3:], jnp.float32),
            jnp.asarray(1.0 / depth[None, None]),
            jnp.asarray(K[None], jnp.float32),
            jnp.asarray(np.linalg.inv(K)[None], jnp.float32))
        gt_flow = np.asarray(ego)[0, :2].transpose(1, 2, 0)
        label = dynamic_label_from_gt(depth, K, w2c1, w2c2, gt_flow)
        assert label.sum() == 0
        # a moving blob disagrees with ego flow -> labeled dynamic
        gt_flow2 = gt_flow.copy()
        gt_flow2[5:10, 5:10] += 10.0
        label2 = dynamic_label_from_gt(depth, K, w2c1, w2c2, gt_flow2)
        assert label2[5:10, 5:10].mean() > 0.9
        assert label2[15:, 15:].sum() == 0


class TestRenderTool:
    def test_render_from_ply_checkpoint(self, tmp_path):
        """Save a scene via the trainer's PLY writer, reload through the
        render tool's loader, and verify a renderable scene comes back."""
        import jax.numpy as jnp
        from das3r_tpu.eval.render_tool import load_gaussians_ply
        from das3r_tpu.models import render as render_mod
        from das3r_tpu.ops.splat import RasterSettings
        from das3r_tpu.train import checkpoint as ckpt
        from tests.test_train import build_synthetic_scene

        params, meta, poses, settings = build_synthetic_scene(
            n=80, cap=128, f=2, hw=32)
        p = str(tmp_path / "pc.ply")
        ckpt.save_scene_ply(p, params, meta)
        params2, meta2, conf = load_gaussians_ply(p, max_sh_degree=3)
        assert params2.xyz.shape[0] == 80  # padding stripped
        out = render_mod.render(
            params2, meta2, settings, poses.pose(0), jnp.zeros(3),
            jnp.asarray(1.0), jnp.asarray(1.0), mode="test",
            conf_per_gaussian=conf)
        assert np.isfinite(np.asarray(out.image)).all()

        # conf-modulated render differs from no_soft when conf < 1
        out2 = render_mod.render(
            params2, meta2, settings, poses.pose(0), jnp.zeros(3),
            jnp.asarray(1.0), jnp.asarray(1.0), mode="no_soft")
        assert np.isfinite(np.asarray(out2.image)).all()
