"""Split-width duplication table (``RasterSettings.heavy_rows_cap``).

The binning sort's domain is N x max_tiles_per_gaussian slots even though
per-Gaussian tile footprints are heavily skewed; the split table keeps the
first ``light_dup_width`` rect cells of every Gaussian in an [N, light]
table and compacts only the heavy Gaussians into a [heavy_rows_cap, D -
light] remainder table. The invariant these tests pin down: with an ample
cap, the sorted key stream — and therefore the EntryStream, the windows,
the rendered image and its gradients — is IDENTICAL to the full-width
table's, because both emit the exact same set of self-describing keys
(binning.py split branch; the sort is order-insensitive to layout).
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.ops.splat import RasterSettings, binning, rasterize
from das3r_tpu.ops.splat.preprocess import preprocess as run_preprocess

from test_splat import make_camera, make_scene


def _prep(settings, n=6000, seed=7):
    rng = np.random.default_rng(seed)
    means, scales, rots, ops, colors = make_scene(n, rng)
    view, proj, campos, tfx, tfy = make_camera(settings)
    return run_preprocess(
        jnp.asarray(means), jnp.asarray(ops[:, None]), settings,
        viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
        campos=jnp.asarray(campos), colors_precomp=jnp.asarray(colors),
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        tan_fovx=tfx, tan_fovy=tfy), (means, scales, rots, ops, colors)


def _base_settings(**kw):
    return RasterSettings(image_height=96, image_width=128, sh_degree=0,
                          max_per_tile=512, max_tiles_per_gaussian=16,
                          max_total_entries=96 * 1024, light_dup_width=4,
                          **kw)


def _heavy_rows(p, s):
    return int(jnp.sum(
        ((jnp.minimum(p.n_tiles_touched, s.max_tiles_per_gaussian)
          > s.light_dup_width) & p.binnable).astype(jnp.int32)))


class TestSplitTableParity:
    @pytest.mark.parametrize("tight", [True, False])
    def test_entry_stream_identical_with_ample_cap(self, tight):
        s0 = _base_settings(tight_binning=tight)
        p, _ = _prep(s0)
        nh = _heavy_rows(p, s0)
        assert nh > 0, "fixture must exercise the heavy table"
        ref = binning.bin_entry_stream(p, s0)
        for mult in (4, 1):  # ample and exactly-sized caps
            cap = -(-max(nh * mult, 128) // 128) * 128
            es = binning.bin_entry_stream(
                p, dataclasses.replace(s0, heavy_rows_cap=cap))
            np.testing.assert_array_equal(np.asarray(es.rank),
                                          np.asarray(ref.rank))
            np.testing.assert_array_equal(np.asarray(es.count),
                                          np.asarray(ref.count))
            np.testing.assert_array_equal(np.asarray(es.chunk_tile),
                                          np.asarray(ref.chunk_tile))
            assert int(es.heavy_overflow) == 0
            assert int(es.dup_overflow) == int(ref.dup_overflow)

    def test_window_path_identical_with_ample_cap(self):
        s0 = _base_settings()
        p, _ = _prep(s0)
        nh = _heavy_rows(p, s0)
        ref = binning.bin_gaussians(p, s0)
        cap = -(-max(nh * 2, 128) // 128) * 128
        tb = binning.bin_gaussians(
            p, dataclasses.replace(s0, heavy_rows_cap=cap))
        np.testing.assert_array_equal(np.asarray(tb.count),
                                      np.asarray(ref.count))
        live = (np.arange(ref.rank.shape[1])[None, :]
                < np.asarray(ref.count)[:, None])
        np.testing.assert_array_equal(np.asarray(tb.rank)[live],
                                      np.asarray(ref.rank)[live])

    def test_starved_cap_drops_farthest_heavy_rows_with_telemetry(self):
        # exact accounting needs tight_binning off (heavy_overflow counts
        # rect cells; the per-pair cull would make it an upper bound)
        s0 = _base_settings(tight_binning=False)
        p, _ = _prep(s0)
        nh = _heavy_rows(p, s0)
        assert nh >= 8
        ref = binning.bin_entry_stream(p, s0)
        cap = max(128, (nh // 3) // 128 * 128)
        es = binning.bin_entry_stream(
            p, dataclasses.replace(s0, heavy_rows_cap=cap))
        dropped = int(jnp.sum(ref.count)) - int(jnp.sum(es.count))
        assert dropped > 0
        assert int(es.heavy_overflow) == dropped
        # demotion keeps the first L entries: every tile keeps at least
        # as many entries as the light table alone provides
        assert int(jnp.sum(es.count)) > 0

    def test_heavy_overflow_upper_bounds_drops_under_tight_binning(self):
        s0 = _base_settings(tight_binning=True)
        p, _ = _prep(s0)
        nh = _heavy_rows(p, s0)
        ref = binning.bin_entry_stream(p, s0)
        cap = max(128, (nh // 3) // 128 * 128)
        es = binning.bin_entry_stream(
            p, dataclasses.replace(s0, heavy_rows_cap=cap))
        dropped = int(jnp.sum(ref.count)) - int(jnp.sum(es.count))
        assert int(es.heavy_overflow) >= dropped > 0


class TestSplitTableRender:
    def test_image_and_grads_match_unsplit(self):
        s0 = _base_settings()
        p, (means, scales, rots, ops, colors) = _prep(s0)
        nh = _heavy_rows(p, s0)
        cap = -(-max(nh * 2, 128) // 128) * 128
        s1 = dataclasses.replace(s0, heavy_rows_cap=cap)
        view, proj, campos, tfx, tfy = make_camera(s0)
        kw = dict(viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
                  campos=jnp.asarray(campos), bg=jnp.zeros(3),
                  tan_fovx=tfx, tan_fovy=tfy,
                  scales=jnp.asarray(scales), rotations=jnp.asarray(rots))

        def loss(settings, m, o, c):
            img, _, aux = rasterize(m, o, settings, colors_precomp=c, **kw)
            return jnp.sum(img * img), (img, aux)

        args = (jnp.asarray(means), jnp.asarray(ops[:, None]),
                jnp.asarray(colors))
        f0 = jax.jit(jax.value_and_grad(
            functools.partial(loss, s0), argnums=(0, 1, 2), has_aux=True))
        f1 = jax.jit(jax.value_and_grad(
            functools.partial(loss, s1), argnums=(0, 1, 2), has_aux=True))
        (l0, (img0, aux0)), g0 = f0(*args)
        (l1, (img1, aux1)), g1 = f1(*args)
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
        for a, b in zip(g0, g1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(aux1.heavy_overflow) == 0
        assert int(aux1.heavy_rows) == _heavy_rows(p, s0)


def test_auto_heavy_cap_gated_by_scale():
    """auto_heavy_cap returns None (single full-width table) below the
    split break-even (round-4 measurement: 3.4 ms/iter loss at 100k x 32)
    and a 1024-rounded cap at production scale."""
    from das3r_tpu.models import autosize
    # 100k x 32 = 3.2M slots < 8M -> no split
    assert autosize.auto_heavy_cap(50_000, 100_000, 32) is None
    # 1.5M x 16 = 24M slots -> split with margin 1.5, 1024-rounded
    cap = autosize.auto_heavy_cap(50_000, 1_500_000, 16)
    assert cap == -(-int(50_000 * 1.5) // 1024) * 1024
    # legacy call (trainer regrow) stays ungated
    assert autosize.auto_heavy_cap(50_000) == -(-75_000 // 1024) * 1024


def test_auto_split_table_picks_min_domain():
    """auto_split_table minimizes n*L + heavy_cap(L)*(D-L) over the probed
    histogram (round-4: the key sort scales with this domain)."""
    from das3r_tpu.models import autosize
    from das3r_tpu.ops.splat.rasterize import DUP_HIST_WIDTHS
    n, d_cap = 1_500_000, 32
    # heavy counts: tons of rows past widths <= 6, few past width 8
    hist = tuple(1_000_000 if w <= 6 else (50_000 if w <= 8 else 1_000)
                 for w in DUP_HIST_WIDTHS)
    st = autosize.ProbeStats(5_000_000, 2048, 40, 1_000_000, hist)
    out = autosize.auto_split_table(st, n, d_cap)
    # widths > 8 add n per step but only drop ~24k heavy slots -> 8 wins
    assert out["light_dup_width"] == 8
    assert out["heavy_rows_cap"] == -(-int(50_000 * 1.5) // 1024) * 1024
    # the chosen domain beats both the full table and the old fixed L=4
    dom = n * 8 + out["heavy_rows_cap"] * (d_cap - 8)
    old4 = n * 4 + (-(-int(1_000_000 * 1.5) // 1024) * 1024) * (d_cap - 4)
    assert dom < n * d_cap and dom < old4
    # below the break-even: no split
    assert autosize.auto_split_table(st, 100_000, 32) == {
        "heavy_rows_cap": None}
