"""A/B binning variants (scan-chained): baseline vs nocompact vs qrank vs
float-div vs all-combined."""
import time
import jax, jax.numpy as jnp

N, H, W, K = 100_000, 384, 512, 30
from das3r_tpu.data.synthetic import random_gaussian_scene
import das3r_tpu.models.render as R
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.ops.splat.preprocess import preprocess
from das3r_tpu.models.gaussians import activated_opacity

s = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                   max_per_tile=1024, max_tiles_per_gaussian=32,
                   max_total_entries=8 * N, depth_sort_bits=0)
params, meta, poses = random_gaussian_scene(n=N, n_frames=2, height=H,
                                            width=W, seed=0)
fov = jnp.asarray(1.0, jnp.float32)

def make_prep(pose7):
    safe_rot = jnp.where(meta.alive[:, None], params.rotation,
                         jnp.asarray([1.0, 0, 0, 0]))
    p = params._replace(rotation=safe_rot)
    xyz_cam, rot_cam = R._camera_frame_gaussians(p, pose7)
    view, proj, campos, tanx, tany = R._raster_common(fov, fov)
    opac = activated_opacity(p) * meta.alive[:, None]
    return preprocess(xyz_cam, opac, s,
                      viewmatrix=view, projmatrix=proj, campos=campos,
                      shs=jnp.concatenate([p.features_dc, p.features_rest], 1),
                      scales=jnp.exp(p.scaling), rotations=rot_cam,
                      tan_fovx=tanx, tan_fovy=tany)

def binv(prep, *, compact, qrank, fdiv):
    n = prep.depth.shape[0]
    d_cap = s.max_tiles_per_gaussian
    nbits = max(int(n - 1).bit_length(), 1)
    alive = prep.binnable
    sort_depth = jnp.where(alive, prep.depth, jnp.inf)
    if qrank:
        # positive f32 bits are monotone; keep the top (32-nbits) bits and
        # pack the index into the low nbits -> payload-free argsort
        dbits = jax.lax.bitcast_convert_type(
            sort_depth.astype(jnp.float32), jnp.uint32)
        mask = jnp.uint32((1 << nbits) - 1)
        key1 = (dbits & ~mask) | jax.lax.iota(jnp.uint32, n)
        order = (jax.lax.sort(key1, dimension=0) & mask).astype(jnp.int32)
    else:
        order = jnp.argsort(sort_depth, stable=True)
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]
    alive_sorted = alive[order]
    width = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    ntt = jnp.minimum(prep.n_tiles_touched[order], d_cap)
    d_idx = jnp.arange(d_cap, dtype=jnp.int32)[None, :]
    if fdiv:
        df = (d_idx.astype(jnp.float32) + 0.5) / width[:, None].astype(jnp.float32)
        row = df.astype(jnp.int32)
        col = d_idx - row * width[:, None]
    else:
        row = d_idx // width[:, None]
        col = d_idx % width[:, None]
    ty = rect_min[:, 1:2] + row
    tx = rect_min[:, 0:1] + col
    tile = ty * s.tiles_x + tx
    dup_valid = alive_sorted[:, None] & (d_idx < ntt[:, None])
    tile = jnp.where(dup_valid, tile, s.n_tiles).astype(jnp.int32)
    rank = jax.lax.broadcasted_iota(jnp.uint32, (n, d_cap), 0)
    packed = (tile.astype(jnp.uint32) << nbits) | rank
    sentinel = jnp.uint32(((s.n_tiles + 1) << nbits) - 1)
    if compact:
        e_cap = s.max_total_entries
        base = jnp.cumsum(ntt) - ntt
        pos = base[:, None] + d_idx
        in_buf = dup_valid & (pos < e_cap)
        pos = jnp.where(in_buf, pos, e_cap).reshape(-1)
        buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
            jnp.where(in_buf, packed, sentinel).reshape(-1),
            unique_indices=True)[:-1]
        sorted_packed = jax.lax.sort(buf_key, dimension=0)
        n_entries = e_cap
    else:
        sorted_packed = jax.lax.sort(packed.reshape(-1), dimension=0)
        n_entries = n * d_cap
    sorted_tile = (sorted_packed >> nbits).astype(jnp.int32)
    sorted_gid = order.astype(jnp.int32)[
        (sorted_packed & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)]
    tile_ids = jnp.arange(s.n_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    end = jnp.searchsorted(sorted_tile, tile_ids, side="right")
    slot = jnp.arange(s.max_per_tile, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(start[:, None] + slot, 0, n_entries - 1)
    gid = sorted_gid[gather_idx]
    return (gid.sum() + (end - start).sum()).astype(jnp.float32)

def scanner(**kw):
    @jax.jit
    def f(pose7):
        def body(c, _):
            return c + 1e-20 * binv(make_prep(c), **kw), ()
        c, _ = jax.lax.scan(body, pose7, None, length=K)
        return c
    return f

variants = [
    ("baseline      ", dict(compact=True, qrank=False, fdiv=False)),
    ("nocompact     ", dict(compact=False, qrank=False, fdiv=False)),
    ("qrank         ", dict(compact=True, qrank=True, fdiv=False)),
    ("fdiv          ", dict(compact=True, qrank=False, fdiv=True)),
    ("all           ", dict(compact=False, qrank=True, fdiv=True)),
]
pose = poses.pose(0)
fs = [(t, scanner(**kw)) for t, kw in variants]
checks = {}
for t, f in fs:
    checks[t] = float(jnp.sum(f(pose)))
for trial in range(2):
    for tag, f in fs:
        p = pose + 1e-6 * (trial + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(f(p))
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"{tag} t{trial}: {dt:6.1f} ms/iter  chk={checks[tag]:.6e}")
