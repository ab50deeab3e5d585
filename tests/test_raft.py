"""RAFT port parity vs the vendored torch implementation (public third-party
code used as a numerical oracle with random weights)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.predictor.raft import RAFT, convert_raft_state_dict

RAFT_CORE = "/root/reference/dynamic_predictor/third_party/RAFT/core"


def load_torch_raft():
    if RAFT_CORE not in sys.path:
        sys.path.insert(0, RAFT_CORE)
    try:
        import argparse
        import torch
        from raft import RAFT as TorchRAFT  # noqa
        args = argparse.Namespace(small=False, dropout=0,
                                  alternate_corr=False,
                                  mixed_precision=False)
        torch.manual_seed(0)
        net = TorchRAFT(args)
        net.eval()
        return net
    except Exception as e:  # pragma: no cover
        pytest.skip(f"torch RAFT unavailable: {e}")


def test_raft_matches_torch_reference():
    import torch
    net = load_torch_raft()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_raft_state_dict(sd))

    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (1, 3, 128, 160)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, 3, 128, 160)).astype(np.float32)

    with torch.no_grad():
        _, ref = net(torch.from_numpy(img1), torch.from_numpy(img2),
                     iters=4, test_mode=True)
    ref = ref.numpy()

    model = RAFT()
    out = model.apply({"params": params}, jnp.asarray(img1),
                      jnp.asarray(img2), iters=4)
    out = np.asarray(out)
    assert out.shape == ref.shape
    # iterative refinement accumulates fp error; require close agreement
    err = np.abs(out - ref)
    assert err.max() < 5e-2, err.max()
    assert err.mean() < 5e-3, err.mean()


def test_raft_param_tree_matches_init():
    net = load_torch_raft()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    conv = convert_raft_state_dict(sd)

    model = RAFT()
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (1, 3, 128, 128)), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), img, img, iters=1)["params"]

    flat_i = {jax.tree_util.keystr(k): v.shape for k, v in
              jax.tree_util.tree_flatten_with_path(init)[0]}
    flat_c = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
              jax.tree_util.tree_flatten_with_path(conv)[0]}
    assert set(flat_i) == set(flat_c), (
        sorted(set(flat_i) ^ set(flat_c))[:10])
    for k in flat_i:
        assert flat_i[k] == flat_c[k], (k, flat_i[k], flat_c[k])
