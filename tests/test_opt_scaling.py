"""find_opt_scaling parity vs an inline torch transcription of the
reference (dust3r/inference.py:208-252) — the real module drags in
trimesh/viz deps, so the oracle here replicates its NaN-mean arithmetic
exactly on the same inputs."""
import numpy as np
import pytest

from das3r_tpu.predictor import inference

torch = pytest.importorskip("torch")


def _ref_find_opt_scaling(gt1, gt2, pr1, pr2, fit_mode, valid1, valid2):
    def invalid_to_nans(arr, valid):
        arr = arr.clone()
        if valid is not None:
            arr[~valid] = float("nan")
        return arr

    nan_gt1 = invalid_to_nans(gt1, valid1).flatten(1, 2)
    pr1 = invalid_to_nans(pr1, valid1).flatten(1, 2)
    if gt2 is not None:
        nan_gt2 = invalid_to_nans(gt2, valid2).flatten(1, 2)
        pr2 = invalid_to_nans(pr2, valid2).flatten(1, 2)
        all_gt = torch.cat((nan_gt1, nan_gt2), dim=1)
        all_pr = torch.cat((pr1, pr2), dim=1)
    else:
        all_gt, all_pr = nan_gt1, pr1
    dot_gt_pr = (all_pr * all_gt).sum(dim=-1)
    dot_gt_gt = all_gt.square().sum(dim=-1)
    if fit_mode.startswith("avg"):
        scaling = dot_gt_pr.nanmean(dim=1) / dot_gt_gt.nanmean(dim=1)
    elif fit_mode.startswith("median"):
        scaling = (dot_gt_pr / dot_gt_gt).nanmedian(dim=1).values
    elif fit_mode.startswith("weiszfeld"):
        scaling = dot_gt_pr.nanmean(dim=1) / dot_gt_gt.nanmean(dim=1)
        for _ in range(10):
            dis = (all_pr - scaling.view(-1, 1, 1) * all_gt).norm(dim=-1)
            w = dis.clip_(min=1e-8).reciprocal()
            scaling = ((w * dot_gt_pr).nanmean(dim=1)
                       / (w * dot_gt_gt).nanmean(dim=1))
    scaling = scaling.clip(min=1e-3)
    return scaling.numpy()


@pytest.mark.parametrize("fit_mode", ["avg", "median",
                                      "weiszfeld_stop_grad"])
@pytest.mark.parametrize("two_views", [False, True])
def test_find_opt_scaling_parity(fit_mode, two_views):
    rng = np.random.default_rng(0)
    B, H, W = 3, 8, 12
    gt1 = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    pr1 = (1.7 * gt1 + 0.05 * rng.normal(size=gt1.shape)).astype(np.float32)
    v1 = rng.uniform(size=(B, H, W)) < 0.8
    gt2 = pr2 = v2 = None
    if two_views:
        gt2 = rng.normal(size=(B, H, W, 3)).astype(np.float32)
        pr2 = (1.7 * gt2 + 0.05 * rng.normal(size=gt2.shape)
               ).astype(np.float32)
        v2 = rng.uniform(size=(B, H, W)) < 0.8

    import jax.numpy as jnp
    ours = np.asarray(inference.find_opt_scaling(
        jnp.asarray(gt1), None if gt2 is None else jnp.asarray(gt2),
        jnp.asarray(pr1), None if pr2 is None else jnp.asarray(pr2),
        fit_mode=fit_mode, valid1=jnp.asarray(v1),
        valid2=None if v2 is None else jnp.asarray(v2)))

    ref = _ref_find_opt_scaling(
        torch.from_numpy(gt1),
        None if gt2 is None else torch.from_numpy(gt2),
        torch.from_numpy(pr1),
        None if pr2 is None else torch.from_numpy(pr2),
        fit_mode, torch.from_numpy(v1),
        None if v2 is None else torch.from_numpy(v2))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-6)
    assert np.all(np.abs(ours - 1.7) < 0.05)


def test_find_opt_scaling_no_mask_and_floor():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    s = np.asarray(inference.find_opt_scaling(
        jnp.asarray(gt), None, jnp.asarray(0.5 * gt), None,
        fit_mode="avg"))
    np.testing.assert_allclose(s, 0.5, rtol=1e-5)
    # scale floor 1e-3 (reference clip)
    s = np.asarray(inference.find_opt_scaling(
        jnp.asarray(gt), None, jnp.asarray(-gt), None, fit_mode="avg"))
    np.testing.assert_allclose(s, 1e-3, rtol=1e-6)
