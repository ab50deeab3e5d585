"""Pallas TPU kernels for per-tile front-to-back alpha blending.

This is the hand-optimized hot path replacing ``blend.py``'s XLA
formulation (same contract, same CUDA-exact semantics — SURVEY.md §2.9,
hard-part #1). Design notes:

  * Layout: pixels on sublanes (P = tile^2 = 256), Gaussians on lanes
    (chunks of 128) — broadcasts of per-Gaussian attributes are free along
    sublanes and the running-transmittance prefix product runs along lanes.
  * The sequential CUDA loop is replaced by a log-depth Hillis-Steele prefix
    product: ``t_after`` (transmittance after each Gaussian) is monotone
    non-increasing along the depth-sorted lane axis, so the early-termination
    rule collapses to ``contribute = valid & (t_after >= eps)`` with NO
    order-dependent scan — PROVIDED the carried transmittance is the sticky
    running product committed past the eps floor (see ``_forward_kernel``):
    the Gaussian that pushes T below eps contributes nothing and retires the
    pixel permanently, exactly like the CUDA ``test_T < 1e-4`` done bit.
  * Per-tile Gaussian lists come in pre-gathered as [T, 9, K] (one XLA
    gather); the backward kernel emits per-slot gradients [T, 9, K] that the
    caller scatter-adds per Gaussian (segment-sum at HBM bandwidth).
  * Backward replays the forward per chunk (storing only per-chunk carry
    transmittance in VMEM scratch) then sweeps chunks in reverse with the
    CUDA-style suffix accumulator S_i = sum_{j>i} (g . c_j) w_j + (g . bg) T_final,
    giving d_alpha_i = (g . c_i) T_i - S_i / (1 - alpha_i).

Attribute packing order (axis 1 of the [T, 9, K] arrays):
    0: mean2d_x  1: mean2d_y  2: conic_xx  3: conic_xy  4: conic_yy
    5: color_r   6: color_g   7: color_b   8: opacity
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from das3r_tpu.ops.splat.settings import RasterSettings

N_ATTR = 9


def _interpret() -> bool:
    """Run in interpreter mode off-TPU so the same code path is testable on
    the CPU mesh (tests) and compiled on real hardware."""
    return jax.default_backend() != "tpu"


def _lane_iota(rows: int, cols: int):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)


def _shifted_prefix_product(one_m, chunk: int):
    """Inclusive prefix product along lanes (Hillis-Steele, log2 steps);
    shifted-in elements are 1."""
    lanes = _lane_iota(one_m.shape[0], chunk)
    x = one_m
    s = 1
    while s < chunk:
        rolled = pltpu.roll(x, s, 1)
        x = x * jnp.where(lanes >= s, rolled, 1.0)
        s *= 2
    return x


def _shifted_suffix_sum(e, chunk: int):
    """EXCLUSIVE suffix sum along lanes: out[i] = sum_{j>i} e[j]."""
    lanes = _lane_iota(e.shape[0], chunk)
    # left-roll by s == circular right-roll by (chunk - s)
    # make it exclusive first: shift left by one (toward lower lanes)
    x = jnp.where(lanes < chunk - 1, pltpu.roll(e, chunk - 1, 1), 0.0)
    s = 1
    while s < chunk:
        rolled = pltpu.roll(x, chunk - s, 1)
        x = x + jnp.where(lanes < chunk - s, rolled, 0.0)
        s *= 2
    return x


def _tri_lt(chunk: int):
    """[chunk, chunk] f32, 1 where row < col (strict lower-triangular
    contraction mask: out[:, j] = sum_{k < j} in[:, k])."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r < c).astype(jnp.float32)


def _tri_gt(chunk: int):
    """1 where row > col: out[:, j] = sum_{k > j} in[:, k] (suffix sum)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r > c).astype(jnp.float32)


def _mm(x, m):
    """[P, chunk] @ [chunk, chunk] on the MXU in fp32."""
    return jax.lax.dot_general(
        x, m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _pixel_coords(settings: RasterSettings, tile_idx):
    """Per-tile pixel coords as [P, 1] columns (pixels on sublanes)."""
    s = settings
    P = s.tile * s.tile
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    tx = tile_idx % s.tiles_x
    ty = tile_idx // s.tiles_x
    px = (tx * s.tile + pix % s.tile).astype(jnp.float32)
    py = (ty * s.tile + pix // s.tile).astype(jnp.float32)
    return px, py


def _chunk_quantities(attr_ref, px, py, c, chunk, delta, count, settings):
    """Shared fwd/bwd math for one chunk: returns per-[P, chunk] arrays.

    Live slots are [delta, delta + count): aligned windows carry up to 127
    leading entries belonging to earlier tiles (binning.py ``_windows``).
    """
    s = settings
    P = px.shape[0]
    sl = pl.ds(c * chunk, chunk)
    a_mx = attr_ref[0, sl].reshape(1, chunk)
    a_my = attr_ref[1, sl].reshape(1, chunk)
    a_cxx = attr_ref[2, sl].reshape(1, chunk)
    a_cxy = attr_ref[3, sl].reshape(1, chunk)
    a_cyy = attr_ref[4, sl].reshape(1, chunk)
    a_op = attr_ref[8, sl].reshape(1, chunk)

    dx = a_mx - px                                   # [P, chunk]
    dy = a_my - py
    power = (-0.5 * (a_cxx * dx * dx + a_cyy * dy * dy)
             - a_cxy * dx * dy)
    alpha_raw = a_op * jnp.exp(power)
    alpha = jnp.minimum(s.alpha_clip, alpha_raw)
    k_global = _lane_iota(P, chunk) + c * chunk
    valid = ((power <= 0.0) & (alpha >= s.alpha_floor)
             & (k_global >= delta) & (k_global < delta + count))
    a = jnp.where(valid, alpha, 0.0)
    return dx, dy, power, alpha_raw, alpha, valid, a


def _forward_kernel(count_ref, delta_ref, attr_ref, bg_ref, color_ref,
                    tfinal_ref, tin_ref, *, settings: RasterSettings,
                    chunk: int, k_width: int):
    s = settings
    P = s.tile * s.tile
    K = k_width
    n_chunks = K // chunk
    t = pl.program_id(0)
    count = count_ref[t]
    delta = delta_ref[t]
    px, py = _pixel_coords(s, t)
    # Per-chunk ENTRY transmittance, saved for the backward pass (kills its
    # forward-replay phase). Zero rows mark chunks the early-termination
    # loop never visited: visited rows always satisfy max(T) >= eps (the
    # loop condition), so the backward recovers n_stop by thresholding.
    tin_ref[:, :, :] = jnp.zeros((n_chunks, P, 1), jnp.float32)

    def body(c, carry):
        # T_out: the CUDA-visible T (last value that passed the eps test);
        # T_run: the STICKY running product over every alpha-tested entry,
        # committed past the floor. Pre-crossing they are equal, so weights
        # from T_run match CUDA exactly; post-crossing T_run < eps makes
        # every later contribute test fail ACROSS chunk boundaries too —
        # the per-pixel `done = true` of the CUDA forward in product form
        # (the r4 advisor proved a single committed-only accumulator can
        # never satisfy the early-exit condition, and it also re-admitted
        # small-alpha entries after a crossing: measured 1.3e-3 image error
        # vs the f64 oracle on a dense 0.9-opacity scene).
        C, T_out, T_run = carry                     # [P,3], [P,1], [P,1]
        tin_ref[c, :, :] = T_run
        _, _, _, _, _, valid, a = _chunk_quantities(
            attr_ref, px, py, c, chunk, delta, count, s)
        one_m = 1.0 - a
        # log-space exclusive prefix product on the MXU: alpha is clipped at
        # 0.99 so log1p(-a) >= log(0.01) is finite; invalid lanes have a=0
        # (log 0-neutral). Replaces the 7-round Hillis-Steele VPU scan.
        cum_before = T_run * jnp.exp(_mm(jnp.log1p(-a), _tri_lt(chunk)))
        t_after = cum_before * one_m                 # [P, chunk]
        contribute = valid & (t_after >= s.transmittance_eps)
        w = jnp.where(contribute, a * cum_before, 0.0)
        sl = pl.ds(c * chunk, chunk)
        adds = [
            jnp.sum(w * attr_ref[5 + ch, sl].reshape(1, chunk),
                    axis=1, keepdims=True)
            for ch in range(3)
        ]
        C = C + jnp.concatenate(adds, axis=1)
        t_cand = jnp.where(contribute, t_after, T_out)
        T_out = jnp.min(t_cand, axis=1, keepdims=True)
        T_run = t_after[:, chunk - 1:chunk]
        return C, T_out, T_run

    def cond(state):
        c, (C, T_out, T_run) = state
        # early exit when EVERY pixel's running product crossed the floor
        # — genuinely reachable now that T_run commits past eps
        return (c < pl.cdiv(delta + count, chunk)) & (
            jnp.max(T_run) >= s.transmittance_eps)

    def wbody(state):
        c, carry = state
        return c + 1, body(c, carry)

    init = (jnp.zeros((P, 3), jnp.float32), jnp.ones((P, 1), jnp.float32),
            jnp.ones((P, 1), jnp.float32))
    # chunks before delta // chunk contain only foreign slots (masked
    # invalid) — skip them; tin rows for them stay zero, which the backward
    # already treats as unvisited.
    _, (C, T, _) = jax.lax.while_loop(cond, wbody, (delta // chunk, init))

    bg = bg_ref[0, :].reshape(1, 3)
    color_ref[:, :] = C + T * bg
    tfinal_ref[:, :] = T


def _backward_kernel(count_ref, delta_ref, attr_ref, bg_ref, cot_ref,
                     tfinal_ref, tin_ref, grad_ref,
                     *, settings: RasterSettings, chunk: int, k_width: int):
    """Per-tile backward: single reverse sweep with the suffix accumulator,
    reading the per-chunk entry transmittance the forward kernel saved."""
    s = settings
    P = s.tile * s.tile
    K = k_width
    n_chunks = K // chunk
    t = pl.program_id(0)
    count = count_ref[t]
    delta = delta_ref[t]
    px, py = _pixel_coords(s, t)
    g = cot_ref[:, :]                                # [P, 3] dL/d(tile color)
    grad_ref[:, :] = jnp.zeros((N_ATTR, K), jnp.float32)

    # Chunks the forward's early-termination loop visited have entry
    # transmittance rows with max(T) >= eps (the loop condition); unvisited
    # rows were zero-filled. Visited chunks form the contiguous range
    # [delta // chunk, delta // chunk + n_vis) — the forward skips the
    # fully-foreign leading chunks — so counting nonzero rows gives the
    # visited count; chunks outside the range contributed nothing and get
    # zero gradient.
    c0 = delta // chunk
    n_vis = 0
    for c in range(n_chunks):
        n_vis = n_vis + jnp.where(
            jnp.max(tin_ref[c, :, :]) >= s.transmittance_eps, 1, 0)
    T_final = tfinal_ref[:, :]                       # [P, 1]

    # ---- reverse sweep
    bg = bg_ref[0, :].reshape(1, 3)
    gbg = jnp.sum(g * bg, axis=1, keepdims=True)     # [P, 1]
    S_init = gbg * T_final                           # bg term of the suffix

    def bbody(i, S):
        c = c0 + n_vis - 1 - i
        T_in = tin_ref[c, :, :]
        dx, dy, power, alpha_raw, alpha, valid, a = _chunk_quantities(
            attr_ref, px, py, c, chunk, delta, count, s)
        one_m = 1.0 - a
        cum_before = T_in * jnp.exp(_mm(jnp.log1p(-a), _tri_lt(chunk)))
        t_after = cum_before * one_m
        contribute = valid & (t_after >= s.transmittance_eps)
        w = jnp.where(contribute, a * cum_before, 0.0)

        sl = pl.ds(c * chunk, chunk)
        gc = jnp.zeros((P, chunk), jnp.float32)      # sum_ch g_ch * color_ch
        for ch in range(3):
            col = attr_ref[5 + ch, sl].reshape(1, chunk)
            gch = g[:, ch:ch + 1]                    # [P, 1]
            # color gradient: dL/dc = g * w, reduced over pixels
            grad_ref[5 + ch, sl] += jnp.sum(w * gch, axis=0)
            gc = gc + gch * col

        e = gc * w                                   # [P, chunk]
        S_within = _mm(e, _tri_gt(chunk))            # suffix sum on the MXU
        S_i = S_within + S                           # [P, chunk]

        d_alpha = jnp.where(
            contribute,
            gc * cum_before - S_i / jnp.maximum(one_m, 1e-12), 0.0)
        # clip: alpha = min(0.99, alpha_raw) — no grad when clipped
        d_alpha_raw = jnp.where(alpha_raw > s.alpha_clip, 0.0, d_alpha)
        d_power = alpha_raw * d_alpha_raw
        # exp(power) == alpha_raw / op for live lanes (saves a transcendental
        # per chunk); d_alpha_raw is zero wherever the quotient is junk.
        a_op = attr_ref[8, sl].reshape(1, chunk)
        d_op = jnp.sum((alpha_raw / jnp.maximum(a_op, 1e-30))
                       * d_alpha_raw, axis=0)
        a_cxx = attr_ref[2, sl].reshape(1, chunk)
        a_cxy = attr_ref[3, sl].reshape(1, chunk)
        a_cyy = attr_ref[4, sl].reshape(1, chunk)
        d_cxx = jnp.sum(-0.5 * dx * dx * d_power, axis=0)
        d_cxy = jnp.sum(-dx * dy * d_power, axis=0)
        d_cyy = jnp.sum(-0.5 * dy * dy * d_power, axis=0)
        ddx = (-(a_cxx * dx + a_cxy * dy)) * d_power
        ddy = (-(a_cyy * dy + a_cxy * dx)) * d_power
        grad_ref[0, sl] += jnp.sum(ddx, axis=0)
        grad_ref[1, sl] += jnp.sum(ddy, axis=0)
        grad_ref[2, sl] += d_cxx
        grad_ref[3, sl] += d_cxy
        grad_ref[4, sl] += d_cyy
        grad_ref[8, sl] += d_op

        # suffix carry for the previous (nearer) chunk
        return jnp.sum(e, axis=1, keepdims=True) + S

    jax.lax.fori_loop(0, n_vis, bbody, S_init)


def _pick_chunk(K: int) -> int:
    if K % 128 == 0:
        return 128
    assert K <= 128 and 128 % K == 0, (
        f"max_per_tile={K} must be a multiple of 128 or a divisor of 128")
    return K


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def blend_tiles_pallas(attrs: jax.Array, counts: jax.Array,
                       deltas: jax.Array, bg: jax.Array,
                       settings: RasterSettings):
    """attrs [T, 9, K], counts/deltas [T] int32, bg [3] ->
    tile colors [T, P, 3]. Live slots are [delta, delta + count) per tile
    (128-aligned binning windows). Gradients flow to ``attrs`` and ``bg``.
    """
    colors, _, _ = _forward_impl(attrs, counts, deltas, bg, settings)
    return colors


def _forward_impl(attrs, counts, deltas, bg, settings: RasterSettings):
    s = settings
    T_tiles = s.n_tiles
    P = s.tile * s.tile
    K = attrs.shape[2]          # max_per_tile, or +128 for aligned windows
    chunk = _pick_chunk(K)
    kernel = functools.partial(_forward_kernel, settings=s, chunk=chunk,
                               k_width=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((None, N_ATTR, K), lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda t, c, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, P, 3), lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 1), lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K // chunk, P, 1), lambda t, c, d: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    colors, tfinal, tin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, P, 3), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, K // chunk, P, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(counts, deltas, attrs, bg.reshape(1, 3))
    return colors, tfinal, tin


def _fwd(attrs, counts, deltas, bg, settings):
    colors, tfinal, tin = _forward_impl(attrs, counts, deltas, bg, settings)
    return colors, (attrs, counts, deltas, bg, tfinal, tin)


def _bwd(settings: RasterSettings, res, g_colors):
    attrs, counts, deltas, bg, tfinal, tin = res
    s = settings
    T_tiles = s.n_tiles
    P = s.tile * s.tile
    K = attrs.shape[2]
    chunk = _pick_chunk(K)
    n_chunks = K // chunk
    kernel = functools.partial(_backward_kernel, settings=s, chunk=chunk,
                               k_width=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((None, N_ATTR, K), lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda t, c, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 3), lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 1), lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_chunks, P, 1), lambda t, c, d: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, N_ATTR, K), lambda t, c, d: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    g_attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_tiles, N_ATTR, K), jnp.float32),
        interpret=_interpret(),
    )(counts, deltas, attrs, bg.reshape(1, 3), g_colors, tfinal, tin)
    # bg gradient: dL/dbg = sum over pixels of g * T_final
    g_bg = jnp.sum(g_colors * tfinal, axis=(0, 1))
    return g_attrs, None, None, g_bg


blend_tiles_pallas.defvjp(_fwd, _bwd)
