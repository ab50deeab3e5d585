"""Binning sub-stage profile (scan-chained, one dispatch per variant)."""
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

def bin_upto(prep, upto):
    n = prep.depth.shape[0]
    d_cap = s.max_tiles_per_gaussian
    alive = prep.binnable
    sort_depth = jnp.where(alive, prep.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)
    if upto == "argsort":
        return order.sum().astype(jnp.float32)
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]
    alive_sorted = alive[order]
    width = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    ntt = jnp.minimum(prep.n_tiles_touched[order], d_cap)
    d_idx = jnp.arange(d_cap, dtype=jnp.int32)[None, :]
    ty = rect_min[:, 1:2] + d_idx // width[:, None]
    tx = rect_min[:, 0:1] + d_idx % width[:, None]
    tile = ty * s.tiles_x + tx
    dup_valid = alive_sorted[:, None] & (d_idx < ntt[:, None])
    tile = jnp.where(dup_valid, tile, s.n_tiles).astype(jnp.int32)
    nbits = max(int(n - 1).bit_length(), 1)
    rank = jax.lax.broadcasted_iota(jnp.uint32, (n, d_cap), 0)
    packed = (tile.astype(jnp.uint32) << nbits) | rank
    sentinel = jnp.uint32(((s.n_tiles + 1) << nbits) - 1)
    e_cap = s.max_total_entries
    base = jnp.cumsum(ntt) - ntt
    pos = base[:, None] + d_idx
    in_buf = dup_valid & (pos < e_cap)
    pos = jnp.where(in_buf, pos, e_cap).reshape(-1)
    buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
        jnp.where(in_buf, packed, sentinel).reshape(-1),
        unique_indices=True)[:-1]
    if upto == "scatter":
        return buf_key.sum().astype(jnp.float32)
    sorted_packed = jax.lax.sort(buf_key, dimension=0)
    if upto == "sort":
        return sorted_packed.sum().astype(jnp.float32)
    sorted_tile = (sorted_packed >> nbits).astype(jnp.int32)
    sorted_gid = order.astype(jnp.int32)[
        (sorted_packed & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)]
    tile_ids = jnp.arange(s.n_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    end = jnp.searchsorted(sorted_tile, tile_ids, side="right")
    slot = jnp.arange(s.max_per_tile, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(start[:, None] + slot, 0, e_cap - 1)
    gid = sorted_gid[gather_idx]
    return (gid.sum() + (end - start).sum()).astype(jnp.float32)

def scanner(upto):
    @jax.jit
    def f(pose7):
        def body(c, _):
            r = bin_upto(make_prep(c), upto)
            return c + 1e-20 * r, ()
        c, _ = jax.lax.scan(body, pose7, None, length=K)
        return c
    return f

pose = poses.pose(0)
fs = [(u, scanner(u)) for u in ("argsort", "scatter", "sort", "full")]
for _, f in fs:
    jax.block_until_ready(f(pose))
for trial in range(2):
    prev = 1.3  # preprocess ms from earlier profile
    for tag, f in fs:
        p = pose + 1e-6 * (trial + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(f(p))
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"prep+{tag:8s} t{trial}: {dt:6.1f} ms/iter  (+{dt-prev:5.1f})")
        prev = dt
