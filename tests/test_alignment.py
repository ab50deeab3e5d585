"""Global-alignment tests on synthetic multi-view scenes with known GT."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from das3r_tpu.eval import trajectory as traj_eval
from das3r_tpu.predictor import alignment, pairs


def make_multiview_scene(f=5, h=24, w=32, seed=0, noise=0.0):
    """GT depths/poses -> exact pairwise pointmap predictions."""
    rng = np.random.default_rng(seed)
    focal = 0.8 * w
    pp = np.asarray([w / 2, h / 2], np.float32)

    depths = 4.0 + rng.uniform(-0.5, 0.5, (f, h, w)).astype(np.float32)
    # smooth the depth a bit
    for _ in range(3):
        depths = (depths + np.roll(depths, 1, 1) + np.roll(depths, 1, 2)) / 3

    poses = np.tile(np.eye(4, dtype=np.float32), (f, 1, 1))
    for i in range(1, f):
        poses[i, :3, :3] = Rotation.from_euler(
            "xyz", rng.uniform(-0.06, 0.06, 3)).as_matrix()
        poses[i, :3, 3] = rng.uniform(-0.25, 0.25, 3)

    xx, yy = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    pts_world = np.empty((f, h, w, 3), np.float32)
    for i in range(f):
        z = depths[i][..., None]
        cam = np.concatenate(
            [z * (np.stack([xx, yy], -1) - pp) / focal, z], -1)
        pts_world[i] = cam @ poses[i, :3, :3].T + poses[i, :3, 3]

    edges = pairs.make_pairs(f, "complete", symmetrize=True)
    E = len(edges)
    pred_i = np.empty((E, h, w, 3), np.float32)
    pred_j = np.empty((E, h, w, 3), np.float32)
    for e, (i, j) in enumerate(edges):
        w2c_i = np.linalg.inv(poses[i])
        pred_i[e] = pts_world[i] @ w2c_i[:3, :3].T + w2c_i[:3, 3]
        pred_j[e] = pts_world[j] @ w2c_i[:3, :3].T + w2c_i[:3, 3]
        if noise > 0:
            pred_i[e] += rng.normal(0, noise, pred_i[e].shape)
            pred_j[e] += rng.normal(0, noise, pred_j[e].shape)
    conf = np.full((E, h, w), 10.0, np.float32)
    mask = np.zeros((E, h, w), np.float32)
    return edges, pred_i, pred_j, conf, mask, poses, depths, focal


class TestMstInit:
    def test_recovers_gt_poses_from_exact_predictions(self):
        (edges, pred_i, pred_j, conf, mask, gt_poses, gt_depths,
         gt_focal) = make_multiview_scene()
        cfg = alignment.AlignerConfig(niter=0, flow_loss_weight=0.0,
                                      temporal_smoothing_weight=0.0)
        im_conf, _, _ = alignment.aggregate_frame_maps(
            edges, conf, conf, mask, 5)
        pts3d, im_poses, im_focals = alignment.mst_init(
            edges, pred_i, pred_j, conf, conf, im_conf, cfg)
        m = traj_eval.eval_metrics(im_poses, gt_poses)
        assert m.ate < 1e-3
        assert abs(im_focals.mean() - gt_focal) / gt_focal < 0.05

    def test_weighted_registration(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((100, 3))
        R = Rotation.random(rng=rng).as_matrix()
        s, t = 1.7, rng.standard_normal(3)
        y = s * x @ R.T + t
        w = rng.uniform(0.5, 2.0, 100)
        s2, R2, T2 = alignment.weighted_rigid_registration(x, y, w)
        assert s2 == pytest.approx(s, rel=1e-6)
        np.testing.assert_allclose(R2, R, atol=1e-6)
        np.testing.assert_allclose(T2, t, atol=1e-6)

    def test_focal_estimator(self):
        (edges, pred_i, *_, gt_focal) = make_multiview_scene()
        pp = np.asarray([16.0, 12.0])
        f = alignment.estimate_focal_weiszfeld(pred_i[0], pp)
        assert f == pytest.approx(gt_focal, rel=0.02)


class TestFullAlignment:
    def test_align_exact_predictions(self):
        (edges, pred_i, pred_j, conf, mask, gt_poses, gt_depths,
         gt_focal) = make_multiview_scene()
        cfg = alignment.AlignerConfig(niter=30, flow_loss_weight=0.0,
                                      temporal_smoothing_weight=0.0)
        out = alignment.align(edges, pred_i, pred_j, conf, conf, mask, cfg)
        m = traj_eval.eval_metrics(out.poses_c2w, gt_poses)
        assert m.ate < 5e-3
        # depths recovered up to the global scale
        ratio = out.depths / gt_depths
        assert np.std(ratio) / np.mean(ratio) < 0.02

    def test_align_noisy_predictions_improves(self):
        (edges, pred_i, pred_j, conf, mask, gt_poses, *_
         ) = make_multiview_scene(noise=0.02, seed=3)
        losses = []
        cfg = alignment.AlignerConfig(niter=60, flow_loss_weight=0.0,
                                      temporal_smoothing_weight=0.01)
        out = alignment.align(edges, pred_i, pred_j, conf, conf, mask, cfg,
                              callback=lambda it, l: losses.append(l))
        assert losses[-1] < losses[0]
        m = traj_eval.eval_metrics(out.poses_c2w, gt_poses)
        assert m.ate < 0.05

    def test_preset_focal_fixed_and_used(self):
        """Known-focal preset (reference preset_focal via --use_gt_focal,
        pose_eval.py:129-144): the given focal must come out EXACTLY
        (frozen, lr 0) and alignment must still recover the poses."""
        (edges, pred_i, pred_j, conf, mask, gt_poses, _, gt_focal
         ) = make_multiview_scene()
        cfg = alignment.AlignerConfig(niter=30, flow_loss_weight=0.0,
                                      temporal_smoothing_weight=0.0,
                                      preset_focals=(float(gt_focal),))
        out = alignment.align(edges, pred_i, pred_j, conf, conf, mask, cfg)
        np.testing.assert_allclose(out.focals, gt_focal, rtol=1e-6)
        m = traj_eval.eval_metrics(out.poses_c2w, gt_poses)
        assert m.ate < 5e-3
        # per-frame preset too (shared_focal off)
        cfg2 = alignment.AlignerConfig(
            niter=5, flow_loss_weight=0.0, temporal_smoothing_weight=0.0,
            shared_focal=False,
            preset_focals=tuple(float(gt_focal)
                                for _ in range(len(gt_poses))))
        out2 = alignment.align(edges, pred_i, pred_j, conf, conf, mask,
                               cfg2)
        np.testing.assert_allclose(out2.focals, gt_focal, rtol=1e-6)

    def test_depth_prior_term_live_and_matches_reference_formula(self):
        """depth_regularize_weight wires the 4th reference loss term
        (optimizer.py:581-587): the knob must change the loss, vanish at
        the init depth, and equal the goem_opt.py:15-36 SI formula with
        the dynamic mask as pixel weight (weight = mask + 1)."""
        import jax.numpy as jnp
        (edges, pred_i, pred_j, conf, mask, gt_poses, gt_depths, gt_focal
         ) = make_multiview_scene()
        F, H, W = gt_depths.shape
        E = len(edges)
        edge_data = alignment.EdgeData(
            ei=jnp.asarray([i for i, _ in edges], jnp.int32),
            ej=jnp.asarray([j for _, j in edges], jnp.int32),
            pred_i=jnp.asarray(pred_i), pred_j=jnp.asarray(pred_j),
            conf_i=jnp.asarray(conf), conf_j=jnp.asarray(conf),
            mask_i=jnp.asarray(mask))
        rng = np.random.default_rng(0)
        dyn = jnp.asarray(rng.uniform(size=(F, H, W)) < 0.3)
        params = alignment.AlignParams(
            pw_poses=jnp.zeros((E, 8)).at[:, 3].set(1.0),
            im_poses=jnp.zeros((F, 7)).at[:, 3].set(1.0),
            depth_log=jnp.asarray(np.log(gt_depths)),
            focal_log=jnp.asarray([20.0 * np.log(gt_focal)], jnp.float32),
            pp_off=jnp.zeros((F, 2), jnp.float32))
        # non-uniform offset (a GLOBAL scale would be removed exactly by
        # the scale-invariant alignment and leave the prior at 0)
        init_depth = jnp.asarray(
            gt_depths * (1.0 + 0.3 * rng.uniform(size=gt_depths.shape))
        ).astype(jnp.float32)

        def loss_at(weight, init):
            cfg = alignment.AlignerConfig(
                niter=10, flow_loss_weight=0.0,
                temporal_smoothing_weight=0.0,
                depth_regularize_weight=weight)
            fn = alignment.make_align_loss(edge_data, dyn, None, cfg,
                                           F, H, W, init_depth=init)
            return float(fn(params, 0))

        base = loss_at(0.0, init_depth)
        on = loss_at(0.5, init_depth)
        assert on > base  # knob is live

        # at the init depth the SI prior is exactly 0
        same = loss_at(0.5, jnp.exp(params.depth_log))
        assert same == pytest.approx(base, rel=1e-6)

        # numpy reimplementation of the reference formula
        dp = np.log(gt_depths)
        di = np.log(np.asarray(init_depth))
        s = np.sum(di - dp, axis=(1, 2)) / (H * W)
        w_pix = np.asarray(dyn).astype(np.float32) + 1.0
        si = (w_pix * (dp + s[:, None, None] - di) ** 2).sum((1, 2)) \
            / (H * W)
        # rel 2e-3: on/base are ~10.1 in fp32, so the subtraction carries
        # ~1e-6 absolute cancellation error against a ~4e-3 term
        assert on - base == pytest.approx(0.5 * si.mean(), rel=2e-3)

    def test_dynamic_aggregation(self):
        (edges, pred_i, pred_j, conf, mask, *_ ) = make_multiview_scene()
        mask = mask.copy()
        # edge 0 is (0, 1): frame 0 sees a dynamic blob
        mask[0, :8, :8] = 1.0
        cfg = alignment.AlignerConfig(niter=0)
        im_conf, dyna_avg, dyna_max = alignment.aggregate_frame_maps(
            edges, conf, conf, mask, 5)
        i0 = edges[0][0]
        assert dyna_max[i0, :8, :8].max() == 1.0
        assert 0 < dyna_avg[i0, :8, :8].max() <= 1.0
        assert dyna_avg[2].max() == 0.0 or edges[0][0] == 2


class TestCleanPointcloud:
    def test_occluding_low_conf_point_suppressed(self):
        from das3r_tpu.predictor.alignment import clean_pointcloud
        H = W = 16
        K = np.asarray([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
        intr = np.stack([K, K])
        poses = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
        depths = np.full((2, H, W), 5.0, np.float32)
        # frame 0 claims a point much closer than frame 1 sees, with LOWER
        # confidence -> suppressed
        depths[0, 8, 8] = 2.0
        confs = np.full((2, H, W), 3.0, np.float32)
        confs[0, 8, 8] = 1.0
        out = clean_pointcloud(confs, intr, poses, depths)
        assert out[0, 8, 8] == 0.0
        assert out[1].min() == 3.0
        # same geometry but HIGHER confidence -> kept
        confs2 = confs.copy()
        confs2[0, 8, 8] = 9.0
        out2 = clean_pointcloud(confs2, intr, poses, depths)
        assert out2[0, 8, 8] == 9.0

    def test_two_frame_alignment(self):
        """The PairViewer role (2-image fallback) is covered by the MST
        path for n=2."""
        (edges, pred_i, pred_j, conf, mask, gt_poses, *_
         ) = make_multiview_scene(f=2)
        cfg = alignment.AlignerConfig(niter=10, flow_loss_weight=0.0,
                                      temporal_smoothing_weight=0.0)
        out = alignment.align(edges, pred_i, pred_j, conf, conf, mask, cfg)
        m = traj_eval.eval_metrics(out.poses_c2w, gt_poses)
        assert np.isfinite(out.depths).all()


def test_pair_view_recovers_pose_and_focal():
    """pair_view (PairViewer equivalent): exact synthetic two-view pointmaps
    -> closed-form focal + PnP pose without optimization."""
    import numpy as np
    from das3r_tpu.predictor import alignment
    H, W, f = 48, 64, 60.0
    pp = np.asarray([W / 2, H / 2], np.float32)
    rng = np.random.default_rng(7)
    # ground-truth scene: random depths in view 1's frame
    xx, yy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    z = rng.uniform(2.0, 6.0, (H, W)).astype(np.float32)
    pts1 = np.stack([(xx - pp[0]) / f * z, (yy - pp[1]) / f * z, z], -1)
    # camera 2: small rotation + translation (c2w)
    th = 0.1
    R = np.asarray([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    t = np.asarray([0.3, -0.1, 0.2], np.float32)
    w2c2 = np.eye(4, dtype=np.float32)
    w2c2[:3, :3], w2c2[:3, 3] = R.T, -R.T @ t
    pts_in2 = pts1.reshape(-1, 3) @ w2c2[:3, :3].T + w2c2[:3, 3]
    pts_in2 = pts_in2.reshape(H, W, 3)     # view 0's points in cam-2 frame
    # view 1's own pointmap: its pixel grid unprojected with depths z2
    c2w2 = np.linalg.inv(w2c2)
    z2 = rng.uniform(2.0, 6.0, (H, W)).astype(np.float32)
    cam2pts = np.stack([(xx - pp[0]) / f * z2, (yy - pp[1]) / f * z2, z2], -1)
    p2_in0 = cam2pts.reshape(-1, 3) @ c2w2[:3, :3].T + c2w2[:3, 3]
    p2_in0 = p2_in0.reshape(H, W, 3)       # view 1's points in frame 0

    edges = [(0, 1), (1, 0)]
    pred_i = np.stack([pts1, cam2pts])     # pred_i[e]: i's pts in frame i
    pred_j = np.stack([p2_in0, pts_in2])   # pred_j[e]: j's pts in frame i
    conf_hi = np.full((H, W), 9.0, np.float32)
    conf_lo = np.full((H, W), 4.0, np.float32)
    conf_i = np.stack([conf_hi, conf_lo])  # edge (0,1) wins -> world = cam 1
    conf_j = np.stack([conf_hi, conf_lo])
    mask_i = np.zeros((2, H, W), np.float32)

    scene = alignment.pair_view(edges, pred_i, pred_j, conf_i, conf_j,
                                mask_i)
    assert scene.final_loss == 0.0
    np.testing.assert_allclose(scene.poses_c2w[0], np.eye(4), atol=1e-5)
    np.testing.assert_allclose(scene.poses_c2w[1], c2w2, atol=1e-3)
    np.testing.assert_allclose(scene.focals, f, rtol=0.02)
    np.testing.assert_allclose(scene.depths[0], z, atol=1e-4)
    # view 2's depth: its frame-0 points taken back into cam 2 = z2
    np.testing.assert_allclose(scene.depths[1], z2, atol=1e-2)
