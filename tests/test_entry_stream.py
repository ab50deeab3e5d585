"""Entry-stream rasterizer tests: the variable-length (no per-tile
capacity) blend path must match the float64 oracle and the [T, K] window
path wherever the latter does not truncate — and must stay exact where it
DOES truncate (per-tile occupancy above max_per_tile, reference CUDA
semantics: diff-gaussian-rasterization keeps every pair)."""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.ops.splat import RasterSettings, binning, rasterize
from das3r_tpu.ops.splat.preprocess import preprocess as run_preprocess
from das3r_tpu.ops.splat.reference import rasterize_reference

from test_splat import make_camera, make_scene


def _kw(settings, scales, rots, colors, bg=None):
    view, proj, campos, tfx, tfy = make_camera(settings)
    bg = np.zeros(3, np.float32) if bg is None else np.asarray(bg, np.float32)
    return dict(viewmatrix=view, projmatrix=proj, campos=campos,
                bg=jnp.asarray(bg), tan_fovx=tfx, tan_fovy=tfy,
                scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
                colors_precomp=jnp.asarray(colors))


def _raster(settings, means, ops, kw, backend="pallas"):
    return jax.jit(functools.partial(
        rasterize, settings=settings, backend=backend))(
        jnp.asarray(means), jnp.asarray(ops), **kw)


class TestEntryStreamForward:
    def test_matches_oracle(self):
        rng = np.random.default_rng(42)
        s = RasterSettings(image_height=128, image_width=128, sh_degree=0,
                           max_per_tile=1024, max_tiles_per_gaussian=64,
                           max_total_entries=48_000, entry_stream=True)
        means, scales, rots, ops, colors = make_scene(1000, rng)
        bg = np.array([0.2, 0.3, 0.1], np.float32)
        kw = _kw(s, scales, rots, colors, bg)
        img, radii, aux = _raster(s, means, ops, kw)
        view, proj, campos, tfx, tfy = make_camera(s)
        ref_img, ref_radii = rasterize_reference(
            means, ops, s, viewmatrix=view, projmatrix=proj, campos=campos,
            bg=bg, tan_fovx=tfx, tan_fovy=tfy, scales=scales,
            rotations=rots, colors_precomp=colors)
        np.testing.assert_array_equal(np.asarray(radii), ref_radii)
        np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-4)
        assert int(aux.tile_overflow) == 0

    def test_exact_where_windows_truncate(self):
        """max_per_tile small enough to truncate the [T, K] path: the
        entry stream must still match the oracle exactly."""
        rng = np.random.default_rng(3)
        s = RasterSettings(image_height=64, image_width=64, sh_degree=0,
                           max_per_tile=128, max_tiles_per_gaussian=64,
                           max_total_entries=64_000, entry_stream=True)
        means, scales, rots, ops, colors = make_scene(1500, rng, spread=0.8)
        kw = _kw(s, scales, rots, colors)
        img, _, aux = _raster(s, means, ops, kw)
        assert int(jnp.max(aux.n_contrib_tiles)) > s.max_per_tile, \
            "scene not dense enough to exercise truncation"
        view, proj, campos, tfx, tfy = make_camera(s)
        ref_img, _ = rasterize_reference(
            means, ops, s, viewmatrix=view, projmatrix=proj, campos=campos,
            bg=np.zeros(3, np.float32), tan_fovx=tfx, tan_fovy=tfy,
            scales=scales, rotations=rots, colors_precomp=colors)
        np.testing.assert_allclose(np.asarray(img), ref_img, atol=3e-4)


class TestEntryStreamBackward:
    def test_grads_match_window_path(self):
        rng = np.random.default_rng(7)
        base = RasterSettings(image_height=128, image_width=128, sh_degree=0,
                              max_per_tile=1024, max_tiles_per_gaussian=64,
                              max_total_entries=48_000, entry_stream=False)
        means, scales, rots, ops, colors = make_scene(800, rng)
        bg = np.array([0.1, 0.0, 0.4], np.float32)
        kw = _kw(base, scales, rots, colors, bg)

        def loss(s):
            def f(m, o, b):
                kw2 = dict(kw, bg=b)
                i, _, _ = rasterize(m, o, s, backend="pallas", **kw2)
                w = jnp.cos(jnp.arange(i.size).reshape(i.shape) * 0.01)
                return jnp.sum(i * w)
            return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

        args = (jnp.asarray(means), jnp.asarray(ops), kw["bg"])
        g_new = loss(dataclasses.replace(base, entry_stream=True))(*args)
        g_old = loss(base)(*args)
        for a, b in zip(g_new, g_old):
            ref = np.abs(np.asarray(b)).max() + 1e-12
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5 * ref)

    def test_segsum_gate_grad_parity(self):
        """The segsum grad reduce engages only at scale (segsum_min_rows,
        round-4 gate: scatter-add wins below ~500k rows). Forcing it on at
        small scale must give the same per-Gaussian gradients as the
        scatter path — guards the gate wiring in entry_blend._bwd."""
        rng = np.random.default_rng(13)
        base = RasterSettings(image_height=64, image_width=96, sh_degree=0,
                              max_per_tile=1024, max_tiles_per_gaussian=64,
                              max_total_entries=32_768, entry_stream=True)
        means, scales, rots, ops, colors = make_scene(700, rng)
        kw = _kw(base, scales, rots, colors)

        def grads(s):
            def f(m, o):
                i, _, _ = rasterize(m, o, s, backend="pallas", **kw)
                w = jnp.sin(jnp.arange(i.size).reshape(i.shape) * 0.02)
                return jnp.sum(i * w)
            return jax.jit(jax.grad(f, argnums=(0, 1)))(
                jnp.asarray(means), jnp.asarray(ops))

        g_seg = grads(dataclasses.replace(base, segsum_min_rows=0))
        g_sca = grads(dataclasses.replace(base, segsum_grad_reduce=False))
        for a, b in zip(g_seg, g_sca):
            ref = np.abs(np.asarray(b)).max() + 1e-12
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5 * ref)

    def test_saturation_skip_reachable_and_exact(self):
        """ADVICE r4: the saturation gate must (a) actually FIRE on a
        dense high-opacity scene — the sticky running transmittance
        (entry_blend forward docstring) makes chunks with
        max(tin) < transmittance_eps occur — and (b) stay image- and
        gradient-exact vs the oracle and the window path through the
        skipped chunks."""
        from das3r_tpu.ops.splat import entry_blend
        from das3r_tpu.ops.splat.preprocess import (
            preprocess as run_preprocess)

        rng = np.random.default_rng(17)
        s = RasterSettings(image_height=64, image_width=64, sh_degree=0,
                           max_per_tile=2048, max_tiles_per_gaussian=64,
                           max_total_entries=96_000, entry_stream=True)
        # dense, near-opaque, large-footprint scene: tiles saturate early
        means, scales, rots, _, colors = make_scene(1200, rng, spread=0.6)
        ops = rng.uniform(0.9, 0.98, 1200).astype(np.float32)
        scales = (scales * 3.0).astype(np.float32)
        bg = np.array([0.3, 0.1, 0.2], np.float32)
        kw = _kw(s, scales, rots, colors, bg)

        # (a) saturated live chunks exist: reproduce the forward's saved
        # per-chunk entry transmittance and count skippable chunks
        view, proj, campos, tfx, tfy = make_camera(s)
        prep = run_preprocess(
            jnp.asarray(means), jnp.asarray(ops), s,
            viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
            campos=jnp.asarray(campos), shs=None,
            colors_precomp=jnp.asarray(colors), scales=jnp.asarray(scales),
            rotations=jnp.asarray(rots), cov3d_precomp=None,
            mean2d_offset=None, tan_fovx=tfx, tan_fovy=tfy)
        es = jax.jit(functools.partial(binning.bin_entry_stream,
                                       settings=s))(prep)
        attr = jnp.concatenate([prep.mean2d, prep.conic, prep.color,
                                prep.opacity[:, None]], 1)
        table = jnp.concatenate(
            [attr[es.order], jnp.zeros((1, attr.shape[1]))])
        _, _, tin = entry_blend._fwd_impl_full(
            table, es.rank, es.chunk_tile, jnp.zeros((1,), jnp.int32), s,
            s.n_tiles)
        tin = np.asarray(tin)                     # [E_al/128, P, 1]
        live = np.asarray(es.chunk_tile) < s.n_tiles
        skippable = (tin.max(axis=(1, 2)) < s.transmittance_eps) & live
        assert skippable.sum() > 0, \
            "fixture no longer saturates; the gate is untested"

        # (b) forward exact vs oracle, grads match the window path
        img, _, _ = _raster(s, means, ops, kw)
        ref_img, _ = rasterize_reference(
            means, ops, s, viewmatrix=view, projmatrix=proj, campos=campos,
            bg=bg, tan_fovx=tfx, tan_fovy=tfy, scales=scales,
            rotations=rots, colors_precomp=colors)
        np.testing.assert_allclose(np.asarray(img), ref_img, atol=3e-4)

        def loss(st):
            def f(m, o):
                i, _, _ = rasterize(m, o, st, backend="pallas", **kw)
                w = jnp.cos(jnp.arange(i.size).reshape(i.shape) * 0.01)
                return jnp.sum(i * w)
            return jax.jit(jax.grad(f, argnums=(0, 1)))(
                jnp.asarray(means), jnp.asarray(ops))

        g_new = loss(s)
        g_old = loss(dataclasses.replace(s, entry_stream=False))
        for a, b in zip(g_new, g_old):
            ref = np.abs(np.asarray(b)).max() + 1e-12
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5 * ref)

    def test_bg_gradient_covers_empty_tiles(self):
        """A scene leaving whole tiles empty: d(sum image)/d(bg) must count
        every pixel's transmittance, including bg-only tiles (they ride the
        external composition; kernel rows for them are never written)."""
        rng = np.random.default_rng(11)
        s = RasterSettings(image_height=64, image_width=64, sh_degree=0,
                           max_per_tile=128, max_tiles_per_gaussian=16,
                           max_total_entries=16_384, entry_stream=True)
        means, scales, rots, ops, colors = make_scene(5, rng, spread=0.2)
        kw = _kw(s, scales, rots, colors)

        def f(b):
            i, _, _ = rasterize(jnp.asarray(means), jnp.asarray(ops), s,
                                backend="pallas", **dict(kw, bg=b))
            return jnp.sum(i)

        g = np.asarray(jax.jit(jax.grad(f))(kw["bg"]))
        # each channel's bg grad = sum of per-pixel final transmittance
        assert (g > 0.8 * 64 * 64).all(), g  # most pixels are background
        eps = 1e-3
        f0 = float(f(kw["bg"]))
        f1 = float(f(kw["bg"] + jnp.asarray([eps, 0, 0])))
        np.testing.assert_allclose(g[0], (f1 - f0) / eps, rtol=5e-3)


class TestStreamBuilder:
    def test_alignment_and_counts(self):
        rng = np.random.default_rng(0)
        s = RasterSettings(image_height=64, image_width=96, sh_degree=0,
                           max_per_tile=1024, max_tiles_per_gaussian=32,
                           max_total_entries=32_768, entry_stream=True)
        means, scales, rots, ops, colors = make_scene(600, rng)
        view, proj, campos, tfx, tfy = make_camera(s)
        prep = run_preprocess(
            jnp.asarray(means), jnp.asarray(ops), s,
            viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
            campos=jnp.asarray(campos), shs=None,
            colors_precomp=jnp.asarray(colors), scales=jnp.asarray(scales),
            rotations=jnp.asarray(rots), cov3d_precomp=None,
            mean2d_offset=None, tan_fovx=tfx, tan_fovy=tfy)
        es = jax.jit(functools.partial(binning.bin_entry_stream,
                                       settings=s))(prep)
        bins = jax.jit(functools.partial(binning.bin_gaussians,
                                         settings=s))(prep)
        n = means.shape[0]
        np.testing.assert_array_equal(np.asarray(es.count),
                                      np.asarray(bins.full_count))
        rank = np.asarray(es.rank)
        ct = np.asarray(es.chunk_tile)
        count = np.asarray(es.count)
        # walk the stream: each tile's segment is 128-aligned, its first
        # count slots carry live ranks (< n), the rest the pad sentinel n
        pos = 0
        for t in range(s.n_tiles):
            c = int(count[t])
            if c == 0:
                continue
            seg = rank[pos:pos + c]
            assert (seg < n).all(), t
            ali = -(-c // 128) * 128
            assert (rank[pos + c:pos + ali] == n).all(), t
            assert (ct[pos // 128:(pos + ali) // 128] == t).all(), t
            # depth order within tile: ranks strictly increasing
            assert (np.diff(seg) > 0).all(), t
            pos += ali
        assert (rank[pos:] == n).all()
        assert (ct[pos // 128:] == s.n_tiles).all()


class TestBf16Table:
    """bf16-storage / fp32-accum variant (RasterSettings.table_bf16).

    Expected envelope (entry_blend.py quantization analysis): image error
    dominated by the bf16 color/opacity ulp ~2e-3 abs; mean2d is a hi+lo
    pair so positions are good to ~4e-3 px and no structural (pixel-shift)
    error appears. Gradients flow through the quantized forward and must
    track the fp32 gradients to a few permille of their magnitude."""

    def _settings(self):
        return RasterSettings(image_height=128, image_width=128, sh_degree=0,
                              max_per_tile=1024, max_tiles_per_gaussian=64,
                              max_total_entries=48_000, entry_stream=True,
                              table_bf16=True)

    def test_forward_close_to_fp32(self):
        rng = np.random.default_rng(21)
        s = self._settings()
        means, scales, rots, ops, colors = make_scene(1000, rng)
        bg = np.array([0.2, 0.3, 0.1], np.float32)
        kw = _kw(s, scales, rots, colors, bg)
        img_b, radii_b, _ = _raster(s, means, ops, kw)
        s32 = dataclasses.replace(s, table_bf16=False)
        img_f, radii_f, _ = _raster(s32, means, ops, kw)
        np.testing.assert_array_equal(np.asarray(radii_b),
                                      np.asarray(radii_f))
        err = np.abs(np.asarray(img_b) - np.asarray(img_f))
        assert err.max() < 1.5e-2, err.max()
        assert err.mean() < 1e-3, err.mean()

    def test_grads_track_fp32(self):
        rng = np.random.default_rng(22)
        s = self._settings()
        means, scales, rots, ops, colors = make_scene(600, rng)
        kw = _kw(s, scales, rots, colors)

        def loss(settings):
            def f(m, o):
                i, _, _ = rasterize(m, o, settings, backend="pallas", **kw)
                w = jnp.cos(jnp.arange(i.size).reshape(i.shape) * 0.01)
                return jnp.sum(i * w)
            return jax.jit(jax.grad(f, argnums=(0, 1)))

        args = (jnp.asarray(means), jnp.asarray(ops))
        g_b = loss(s)(*args)
        g_f = loss(dataclasses.replace(s, table_bf16=False))(*args)
        for a, b in zip(g_b, g_f):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all()
            ref = np.abs(b).max() + 1e-12
            # quantized forward => grads differ by the quantization scale,
            # not by structure
            np.testing.assert_allclose(a, b, atol=8e-3 * ref)


class TestSegmentSumByRank:
    """Direct unit test of the scatter-add replacement in the entry-stream
    backward (`_segment_sum_by_rank`): rank-sort + block-local prefix sums
    + boundary gathers must equal the scatter-add for every layout a real
    stream can produce — segments inside one block, segments straddling a
    block boundary, empty rows, and a many-block pad-sentinel run whose
    value is allowed to be garbage but must stay finite."""

    def _check(self, rank, n_rows, rng, sentinel=None):
        from das3r_tpu.ops.splat import entry_blend
        e = rank.shape[0]
        assert e % entry_blend._SEG_BLOCK == 0
        g = jnp.asarray(rng.normal(size=(e, entry_blend.N_ATTR)) * 10.0,
                        jnp.float32)
        got = np.asarray(jax.jit(
            entry_blend._segment_sum_by_rank,
            static_argnums=2)(g, jnp.asarray(rank), n_rows))
        want = np.zeros((n_rows, entry_blend.N_ATTR), np.float32)
        np.add.at(want, rank, np.asarray(g))
        assert np.isfinite(got).all()
        rows = np.arange(n_rows)
        if sentinel is not None:
            rows = rows[rows != sentinel]     # garbage-but-finite allowed
        np.testing.assert_allclose(got[rows], want[rows],
                                   rtol=0, atol=2e-4 * np.abs(want).max())

    def test_random_runs_spanning_blocks(self):
        from das3r_tpu.ops.splat import entry_blend
        B = entry_blend._SEG_BLOCK
        rng = np.random.default_rng(7)
        n_rows, e = 900, 4 * B
        # random run lengths <= 700 (< B, so every run spans <= 2 blocks),
        # several rows empty, remainder filled by the sentinel row
        counts = np.zeros(n_rows, np.int64)
        used = 0
        for r in rng.permutation(n_rows - 1):
            c = int(rng.integers(0, 700))
            c = min(c, e - used)
            counts[r] = c
            used += c
            if used == e:
                break
        counts[n_rows - 1] += e - counts.sum()   # sentinel soaks the rest
        rank = np.repeat(np.arange(n_rows), counts).astype(np.int32)
        rank = rng.permutation(rank)             # stream order is arbitrary
        self._check(rank, n_rows, rng, sentinel=n_rows - 1)

    def test_exact_block_boundaries(self):
        from das3r_tpu.ops.splat import entry_blend
        B = entry_blend._SEG_BLOCK
        rng = np.random.default_rng(8)
        # runs engineered to start/end exactly on block boundaries
        counts = [B, B // 2, B // 2, 1, B - 1, B]
        n_rows = len(counts) + 3                 # 3 trailing empty rows
        rank = np.repeat(np.arange(len(counts)), counts).astype(np.int32)
        self._check(rank, n_rows, rng)

    def test_sentinel_spanning_many_blocks(self):
        from das3r_tpu.ops.splat import entry_blend
        B = entry_blend._SEG_BLOCK
        rng = np.random.default_rng(9)
        n_rows = 5
        counts = np.array([3, 0, 100, 0, 8 * B - 103])
        rank = np.repeat(np.arange(n_rows), counts).astype(np.int32)
        self._check(rank, n_rows, rng, sentinel=n_rows - 1)
