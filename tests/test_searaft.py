"""SEA-RAFT (RAFT2 'M') parity vs the vendored torch implementation with
random weights (torchvision pretrained download is stubbed out — this image
has no network access)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.predictor.searaft import (SeaRaft, SeaRaftConfig,
                                         convert_searaft_state_dict)

RAFT_CORE = "/root/reference/dynamic_predictor/third_party/RAFT/core"


def load_torch_raft2():
    if RAFT_CORE not in sys.path:
        sys.path.insert(0, RAFT_CORE)
    try:
        import argparse
        import torch
        import extractor
        # no-network: skip the torchvision pretrained init
        extractor.ResNetFPN._init_weights = lambda self, args: None
        from raft import RAFT2  # noqa
        args = argparse.Namespace(
            dim=128, initial_dim=64, block_dims=[64, 128, 256],
            radius=4, corr_levels=4, num_blocks=2, iters=2,
            pretrain="resnet34", use_var=True, var_min=0, var_max=10)
        torch.manual_seed(0)
        net = RAFT2(args)
        net.eval()
        return net
    except Exception as e:  # pragma: no cover
        pytest.skip(f"torch RAFT2 unavailable: {e}")


def test_searaft_param_tree_matches_init():
    net = load_torch_raft2()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    conv = convert_searaft_state_dict(sd)
    model = SeaRaft(SeaRaftConfig(iters=2))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 64)), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), img, img, iters=1)["params"]
    flat_i = {jax.tree_util.keystr(k): v.shape for k, v in
              jax.tree_util.tree_flatten_with_path(init)[0]}
    flat_c = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
              jax.tree_util.tree_flatten_with_path(conv)[0]}
    assert set(flat_i) == set(flat_c), sorted(set(flat_i) ^ set(flat_c))[:10]
    for k in flat_i:
        assert flat_i[k] == flat_c[k], (k, flat_i[k], flat_c[k])


def test_searaft_matches_torch_reference():
    import torch
    net = load_torch_raft2()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_searaft_state_dict(sd))
    rng = np.random.default_rng(1)
    img1 = rng.uniform(0, 255, (1, 3, 128, 160)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, 3, 128, 160)).astype(np.float32)
    with torch.no_grad():
        _, ref = net(torch.from_numpy(img1), torch.from_numpy(img2),
                     iters=2, test_mode=True)
    ref = ref.numpy()
    model = SeaRaft(SeaRaftConfig(iters=2))
    out = np.asarray(model.apply({"params": params}, jnp.asarray(img1),
                                 jnp.asarray(img2), iters=2))
    assert out.shape == ref.shape
    err = np.abs(out - ref)
    assert err.max() < 5e-2, err.max()
    assert err.mean() < 5e-3, err.mean()
