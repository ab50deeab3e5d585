"""ManyAR / transpose_to_landscape equivalence (reference
patch_embed.py:33-70, misc.py:76-118): a portrait image stored transposed in
a landscape buffer must produce — token-exactly — the same predictions as
processing the true portrait image directly, with outputs transposed back
into the landscape layout."""
import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.models.croco.dust3r import (AsymmetricCroCo3D, Dust3rConfig,
                                           transposed_result)
from das3r_tpu.predictor import inference

TINY = Dust3rConfig(enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
                    dec_embed_dim=32, dec_depth=4, dec_num_heads=2)


def _tiny_model(h, w, seed=0):
    model = AsymmetricCroCo3D(cfg=TINY)
    img = jnp.zeros((1, 3, h, w))
    variables = model.init(jax.random.PRNGKey(seed), img, img)
    return model, variables["params"]


class TestManyAR:
    def test_portrait_tokens_equal_true_orientation(self):
        """encode(landscape_buffer, portrait=True) == encode(true portrait
        image) — token- and position-exact."""
        h, w = 64, 48                                  # true portrait shape
        model, params = _tiny_model(h, w)
        rng = np.random.default_rng(0)
        img_p = jnp.asarray(rng.standard_normal((2, 3, h, w)), jnp.float32)
        buf_l = img_p.swapaxes(-1, -2)                 # landscape storage

        f_direct, pos_direct = model.apply({"params": params}, img_p,
                                           method="encode")
        f_many, pos_many = model.apply({"params": params}, buf_l,
                                       portrait=True, method="encode")
        np.testing.assert_array_equal(np.asarray(f_direct),
                                      np.asarray(f_many))
        np.testing.assert_array_equal(np.asarray(pos_direct),
                                      np.asarray(pos_many))

    def test_forward_portrait_equals_transposed_direct(self):
        """Full forward: ManyAR portrait path == direct portrait forward
        with spatially transposed maps."""
        h, w = 64, 48
        model, params = _tiny_model(h, w, seed=1)
        rng = np.random.default_rng(1)
        i1 = jnp.asarray(rng.standard_normal((1, 3, h, w)), jnp.float32)
        i2 = jnp.asarray(rng.standard_normal((1, 3, h, w)), jnp.float32)

        direct1, direct2 = model.apply({"params": params}, i1, i2)
        many1, many2 = model.apply(
            {"params": params}, i1.swapaxes(-1, -2), i2.swapaxes(-1, -2),
            portrait1=True, portrait2=True)
        for d, m in ((direct1, many1), (direct2, many2)):
            t = transposed_result(m)    # undo the landscape_out transpose
            for k in d:
                np.testing.assert_array_equal(np.asarray(d[k]),
                                              np.asarray(t[k]), err_msg=k)
                # the landscape-layout output really is transposed
                assert m[k].shape[1:3] == (w, h)

    def test_apply_manyar_mixed_batch(self):
        """Host grouping handles a batch mixing portrait and landscape
        views and returns maps in landscape layout, in input order."""
        h, w = 48, 64                                   # landscape buffer
        model, params = _tiny_model(h, w, seed=2)
        rng = np.random.default_rng(2)
        img1 = jnp.asarray(rng.standard_normal((3, 3, h, w)), jnp.float32)
        img2 = jnp.asarray(rng.standard_normal((3, 3, h, w)), jnp.float32)
        # rows 0,2 landscape; row 1 portrait (stored transposed)
        ts_l = np.asarray([[h, w], [w, h], [h, w]])

        r1, r2 = inference.apply_manyar(model, params, img1, img2,
                                        ts_l, ts_l)
        assert r1["pts3d"].shape[:3] == (3, h, w)

        # row 1 must equal the single-pair portrait forward
        s1, s2 = model.apply({"params": params}, img1[1:2], img2[1:2],
                             portrait1=True, portrait2=True)
        np.testing.assert_array_equal(np.asarray(r1["pts3d"][1]),
                                      np.asarray(s1["pts3d"][0]))
        np.testing.assert_array_equal(np.asarray(r2["conf"][1]),
                                      np.asarray(s2["conf"][0]))
        # row 0 must match the landscape forward (allclose, not bit-equal:
        # the group ran as batch-2, the single-pair check as batch-1, and
        # XLA tiles the matmuls differently per batch size)
        l1, _ = model.apply({"params": params}, img1[0:1], img2[0:1])
        np.testing.assert_allclose(np.asarray(r1["pts3d"][0]),
                                   np.asarray(l1["pts3d"][0]),
                                   rtol=1e-4, atol=1e-5)
