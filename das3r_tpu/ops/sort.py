"""Pallas TPU bitonic sort for (uint32 key, int32 value) pairs.

Replaces ``jax.lax.sort`` in the rasterizer's binning hot path — XLA's TPU
sort streams every compare-exchange stage through HBM (~225 ms for 6M
pairs); this kernel runs all stages with distance < BLOCK entirely in VMEM
and only the few cross-block merge stages touch HBM.

Structure (classic block-bitonic decomposition of the full network
``for k in 2..N: for j in k/2..1``):

  * ``_block_sort_kernel``: per block of S elements, all stages with
    k <= S (statically unrolled; partner exchange via lane rolls for
    j < 128 and sublane/row rolls for j >= 128). Blocks end up sorted
    ascending/descending by block parity — exactly the state the global
    network expects at k = 2S.
  * per k-level in 2S..Npad: cross-block compare-exchange passes
    (``_cross_block_kernel``, one pallas_call per j >= S stage, grid over
    block pairs) followed by one ``_block_merge_kernel`` pass running all
    j < S stages in VMEM with the per-block direction of that k.

N is padded to a power of two with 0xFFFFFFFF sentinel keys.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compare_exchange(k_arr, v_arr, j: int, asc, flat):
    """One stage: partner = index XOR j (j < S). k_arr/v_arr: [R, 128]."""
    R = k_arr.shape[0]
    if j < LANES:
        lane = flat & (LANES - 1)
        is_low = (lane & j) == 0
        pk = jnp.where(is_low, pltpu.roll(k_arr, LANES - j, 1),
                       pltpu.roll(k_arr, j, 1))
        pv = jnp.where(is_low, pltpu.roll(v_arr, LANES - j, 1),
                       pltpu.roll(v_arr, j, 1))
    else:
        jr = j // LANES
        row = flat // LANES
        is_low = (row & jr) == 0
        pk = jnp.where(is_low, pltpu.roll(k_arr, R - jr, 0),
                       pltpu.roll(k_arr, jr, 0))
        pv = jnp.where(is_low, pltpu.roll(v_arr, R - jr, 0),
                       pltpu.roll(v_arr, jr, 0))
    take_min = asc == is_low
    # NB: jnp.where over boolean operands fails Mosaic lowering on this
    # toolchain — express the select with logical ops instead.
    keep_own = ((take_min & (k_arr <= pk))
                | (~take_min & (k_arr >= pk)))
    new_k = jnp.where(keep_own, k_arr, pk)
    new_v = jnp.where(keep_own, v_arr, pv)
    return new_k, new_v


def _merge_stages(k_arr, v_arr, flat, S: int, asc):
    """All stages j = S/2 .. 1 (a bitonic merge of length S)."""
    j = S // 2
    while j >= 1:
        k_arr, v_arr = _compare_exchange(k_arr, v_arr, j, asc, flat)
        j //= 2
    return k_arr, v_arr


def _block_sort_kernel(kin, vin, kout, vout, *, S: int):
    R = S // LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = row * LANES + lane
    b = pl.program_id(0)
    k_arr = kin[:, :]
    v_arr = vin[:, :]
    k = 2
    while k <= S // 2:
        asc = (flat & k) == 0
        k_arr, v_arr = _merge_stages(k_arr, v_arr, flat, k, asc)
        k *= 2
    # k == S: direction = global block parity bit
    asc_block = (b & 1) == 0
    asc = jnp.full((R, LANES), asc_block, jnp.bool_)
    k_arr, v_arr = _merge_stages(k_arr, v_arr, flat, S, asc)
    kout[:, :] = k_arr
    vout[:, :] = v_arr


def _cross_block_kernel(klo, vlo, khi, vhi, klo_o, vlo_o, khi_o, vhi_o,
                        *, S: int, k_level: int, j: int):
    """Compare-exchange between block pairs at distance j >= S. The grid
    enumerates the LOW block of each pair; the BlockSpec maps the partner.
    Direction from the global index bit of k_level (uniform per pair)."""
    p = pl.program_id(0)
    jb = j // S
    group = 2 * jb
    base_block = (p // jb) * group + (p % jb)       # low block id
    asc = ((base_block * S) & k_level) == 0
    a_k = klo[:, :]
    b_k = khi[:, :]
    a_v = vlo[:, :]
    b_v = vhi[:, :]
    # (no jnp.where over boolean operands — Mosaic can't lower it)
    keep = (asc & (a_k <= b_k)) | (~asc & (a_k >= b_k))
    klo_o[:, :] = jnp.where(keep, a_k, b_k)
    vlo_o[:, :] = jnp.where(keep, a_v, b_v)
    khi_o[:, :] = jnp.where(keep, b_k, a_k)
    vhi_o[:, :] = jnp.where(keep, b_v, a_v)


def _block_merge_kernel(kin, vin, kout, vout, *, S: int, k_level: int):
    """All j < S stages of merge level k_level for one block."""
    R = S // LANES
    b = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = row * LANES + lane
    asc_block = ((b * S) & k_level) == 0
    asc = jnp.full((R, LANES), asc_block, jnp.bool_)
    k_arr, v_arr = _merge_stages(kin[:, :], vin[:, :], flat, S, asc)
    kout[:, :] = k_arr
    vout[:, :] = v_arr


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _merge_level_kernel(k_hbm, v_hbm, k_out, v_out, kbuf, vbuf, sem,
                        *, S: int, k_level: int, C: int):
    """One FULL merge level (all its cross-block stages + the local j<S
    stages) in a single kernel: the sequential TPU grid iterates
    (stage, program) in stage-major order, each program DMAs its block pair
    from HBM (in-place via output aliasing), compare-exchanges in VMEM and
    writes back. The final stage runs the intra-block merge.

    grid = (n_cross_stages + 1, C); during cross stage s only programs
    p < C/2 act; in the last stage every program merges its own block.
    """
    R = S // LANES
    s_idx = pl.program_id(0)
    p = pl.program_id(1)
    n_cross = pl.num_programs(0) - 1

    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = row * LANES + lane

    @pl.when((s_idx < n_cross) & (p < C // 2))
    def _cross():
        # j for this stage: k_level/2 >> s_idx ; jb = j/S
        jb = (k_level // (2 * S)) >> s_idx
        low = (p // jb) * (2 * jb) + (p % jb)
        high = low + jb
        cp1 = pltpu.make_async_copy(k_out.at[pl.ds(low * R, R)],
                                    kbuf.at[0], sem.at[0])
        cp2 = pltpu.make_async_copy(k_out.at[pl.ds(high * R, R)],
                                    kbuf.at[1], sem.at[1])
        cp3 = pltpu.make_async_copy(v_out.at[pl.ds(low * R, R)],
                                    vbuf.at[0], sem.at[2])
        cp4 = pltpu.make_async_copy(v_out.at[pl.ds(high * R, R)],
                                    vbuf.at[1], sem.at[3])
        cp1.start(); cp2.start(); cp3.start(); cp4.start()
        cp1.wait(); cp2.wait(); cp3.wait(); cp4.wait()
        a_k = kbuf[0]
        b_k = kbuf[1]
        a_v = vbuf[0]
        b_v = vbuf[1]
        asc = ((low * S) & k_level) == 0
        keep = (asc & (a_k <= b_k)) | (~asc & (a_k >= b_k))
        kbuf[0] = jnp.where(keep, a_k, b_k)
        kbuf[1] = jnp.where(keep, b_k, a_k)
        vbuf[0] = jnp.where(keep, a_v, b_v)
        vbuf[1] = jnp.where(keep, b_v, a_v)
        w1 = pltpu.make_async_copy(kbuf.at[0], k_out.at[pl.ds(low * R, R)],
                                   sem.at[0])
        w2 = pltpu.make_async_copy(kbuf.at[1], k_out.at[pl.ds(high * R, R)],
                                   sem.at[1])
        w3 = pltpu.make_async_copy(vbuf.at[0], v_out.at[pl.ds(low * R, R)],
                                   sem.at[2])
        w4 = pltpu.make_async_copy(vbuf.at[1], v_out.at[pl.ds(high * R, R)],
                                   sem.at[3])
        w1.start(); w2.start(); w3.start(); w4.start()
        w1.wait(); w2.wait(); w3.wait(); w4.wait()

    @pl.when(s_idx == n_cross)
    def _local():
        cp1 = pltpu.make_async_copy(k_out.at[pl.ds(p * R, R)], kbuf.at[0],
                                    sem.at[0])
        cp2 = pltpu.make_async_copy(v_out.at[pl.ds(p * R, R)], vbuf.at[0],
                                    sem.at[1])
        cp1.start(); cp2.start(); cp1.wait(); cp2.wait()
        asc_block = ((p * S) & k_level) == 0
        asc = jnp.full((R, LANES), asc_block, jnp.bool_)
        k_arr, v_arr = _merge_stages(kbuf[0], vbuf[0], flat, S, asc)
        kbuf[0] = k_arr
        vbuf[0] = v_arr
        w1 = pltpu.make_async_copy(kbuf.at[0], k_out.at[pl.ds(p * R, R)],
                                   sem.at[0])
        w2 = pltpu.make_async_copy(vbuf.at[0], v_out.at[pl.ds(p * R, R)],
                                   sem.at[1])
        w1.start(); w2.start(); w1.wait(); w2.wait()


def _run_merge_level(k2, v2, S: int, k_level: int, C: int, interp: bool):
    import math
    R = S // LANES
    n_cross = int(math.log2(k_level // S))
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        functools.partial(_merge_level_kernel, S=S, k_level=k_level, C=C),
        grid=(n_cross + 1, C),
        in_specs=[any_spec, any_spec],
        out_specs=[any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                   jax.ShapeDtypeStruct(v2.shape, v2.dtype)],
        scratch_shapes=[pltpu.VMEM((2, R, LANES), jnp.uint32),
                        pltpu.VMEM((2, R, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((4,))],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interp,
    )(k2, v2)


@functools.partial(jax.jit, static_argnames=("block",))
def sort_pairs_v2(keys: jax.Array, values: jax.Array, block: int = 1 << 13):
    """Like ``sort_pairs`` but each merge level is ONE kernel doing its own
    in-place HBM DMA — ~log2(C)+1 dispatches total instead of
    ~log2(C)^2/2."""
    n = keys.shape[0]
    npad = max(_next_pow2(n), block)
    S = min(block, npad)
    C = npad // S
    R = S // LANES

    kp = jnp.full((npad,), jnp.uint32(0xFFFFFFFF)).at[:n].set(keys)
    vp = jnp.zeros((npad,), jnp.int32).at[:n].set(values)
    k2 = kp.reshape(C * R, LANES)
    v2 = vp.reshape(C * R, LANES)

    interp = _interpret()
    block_spec = pl.BlockSpec((R, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    k2, v2 = pl.pallas_call(
        functools.partial(_block_sort_kernel, S=S),
        grid=(C,),
        in_specs=[block_spec, block_spec],
        out_specs=[block_spec, block_spec],
        out_shape=[jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                   jax.ShapeDtypeStruct(v2.shape, v2.dtype)],
        interpret=interp,
    )(k2, v2)

    k_level = 2 * S
    while k_level <= npad:
        k2, v2 = _run_merge_level(k2, v2, S, k_level, C, interp)
        k_level *= 2
    return k2.reshape(-1)[:n], v2.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("block",))
def sort_pairs(keys: jax.Array, values: jax.Array, block: int = 1 << 17):
    """Sort (keys [N] uint32, values [N] int32) by key ascending.

    Equivalent to ``jax.lax.sort((keys, values), num_keys=1)`` for keys
    below 0xFFFFFFFF (the padding sentinel; entries with the sentinel key
    may have arbitrary values, matching the binning use where sentinel
    rows are never read).
    """
    n = keys.shape[0]
    npad = max(_next_pow2(n), block)
    S = min(block, npad)
    C = npad // S
    R = S // LANES

    kp = jnp.full((npad,), jnp.uint32(0xFFFFFFFF)).at[:n].set(keys)
    vp = jnp.zeros((npad,), jnp.int32).at[:n].set(values)
    k2 = kp.reshape(C * R, LANES)
    v2 = vp.reshape(C * R, LANES)

    interp = _interpret()
    block_spec = pl.BlockSpec((R, LANES), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    k2, v2 = pl.pallas_call(
        functools.partial(_block_sort_kernel, S=S),
        grid=(C,),
        in_specs=[block_spec, block_spec],
        out_specs=[block_spec, block_spec],
        out_shape=[jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                   jax.ShapeDtypeStruct(v2.shape, v2.dtype)],
        interpret=interp,
    )(k2, v2)

    k_level = 2 * S
    while k_level <= npad:
        j = k_level // 2
        while j >= S:
            jb = j // S
            lo_spec = pl.BlockSpec(
                (R, LANES),
                lambda p, jb=jb: ((p // jb) * 2 * jb + (p % jb), 0),
                memory_space=pltpu.VMEM)
            hi_spec = pl.BlockSpec(
                (R, LANES),
                lambda p, jb=jb: ((p // jb) * 2 * jb + (p % jb) + jb, 0),
                memory_space=pltpu.VMEM)
            k2, v2, k2b, v2b = pl.pallas_call(
                functools.partial(_cross_block_kernel, S=S,
                                  k_level=k_level, j=j),
                grid=(C // 2,),
                in_specs=[lo_spec, lo_spec, hi_spec, hi_spec],
                out_specs=[lo_spec, lo_spec, hi_spec, hi_spec],
                out_shape=[jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                           jax.ShapeDtypeStruct(v2.shape, v2.dtype),
                           jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                           jax.ShapeDtypeStruct(v2.shape, v2.dtype)],
                interpret=interp,
            )(k2, v2, k2, v2)
            # low halves live in (k2, v2), high halves in (k2b, v2b):
            # merge the two aliased outputs (each wrote its own blocks)
            block_ids = jnp.arange(C * R, dtype=jnp.int32) // R
            in_hi = ((block_ids // jb) % 2) == 1
            k2 = jnp.where(in_hi[:, None], k2b, k2)
            v2 = jnp.where(in_hi[:, None], v2b, v2)
            j //= 2
        k2, v2 = pl.pallas_call(
            functools.partial(_block_merge_kernel, S=S, k_level=k_level),
            grid=(C,),
            in_specs=[block_spec, block_spec],
            out_specs=[block_spec, block_spec],
            out_shape=[jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                       jax.ShapeDtypeStruct(v2.shape, v2.dtype)],
            interpret=interp,
        )(k2, v2)
        k_level *= 2

    return k2.reshape(-1)[:n], v2.reshape(-1)[:n]
