"""Split the backward: grad wrt gathered tile attrs (pallas bwd only)
vs grad wrt params (adds scatter-add + preprocess/SH bwd)."""
import time
import jax, jax.numpy as jnp

N, H, W, K = 100_000, 384, 512, 30
from das3r_tpu.data.synthetic import random_gaussian_scene
import das3r_tpu.models.render as R
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.ops.splat import binning, blend, pallas_blend
from das3r_tpu.ops.splat.preprocess import preprocess
from das3r_tpu.models.gaussians import activated_opacity
from das3r_tpu.train import loss as loss_mod

s = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                   max_per_tile=1024, max_tiles_per_gaussian=32,
                   max_total_entries=8 * N, depth_sort_bits=0)
params, meta, poses = random_gaussian_scene(n=N, n_frames=2, height=H,
                                            width=W, seed=0)
fov = jnp.asarray(1.0, jnp.float32)
bg = jnp.zeros(3)
gt = jnp.zeros((3, H, W))

def upto_gather(pose7):
    safe_rot = jnp.where(meta.alive[:, None], params.rotation,
                         jnp.asarray([1.0, 0, 0, 0]))
    p0 = params._replace(rotation=safe_rot)
    xyz_cam, rot_cam = R._camera_frame_gaussians(p0, pose7)
    view, proj, campos, tanx, tany = R._raster_common(fov, fov)
    opac = activated_opacity(p0) * meta.alive[:, None]
    p = preprocess(xyz_cam, opac, s,
                   viewmatrix=view, projmatrix=proj, campos=campos,
                   shs=jnp.concatenate([p0.features_dc, p0.features_rest], 1),
                   scales=jnp.exp(p0.scaling), rotations=rot_cam,
                   tan_fovx=tanx, tan_fovy=tany)
    bins = jax.tree.map(jax.lax.stop_gradient,
                        binning.bin_gaussians(jax.lax.stop_gradient(p), s))
    attr_mat = jnp.concatenate(
        [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
    gathered = jnp.swapaxes(attr_mat[bins.gid], 1, 2)     # [T, 9, K]
    return gathered, bins

def img_loss(gathered, bins):
    tiles = pallas_blend.blend_tiles_pallas(gathered, bins.count, bg, s)
    img = blend.assemble_image(tiles, s)
    return loss_mod.photometric_loss(img, gt, params.conf_static[0]).loss

def fb_attrs(pose7):
    gathered, bins = upto_gather(pose7)
    gathered = jax.lax.stop_gradient(gathered)
    g = jax.grad(img_loss)(gathered, bins)
    return pose7 + 1e-12 * jnp.sum(g)

def fb_full(pose7):
    def f(pose7):
        gathered, bins = upto_gather(pose7)
        return img_loss(gathered, bins)
    g = jax.grad(f)(pose7)
    return pose7 + 1e-12 * jnp.sum(g)

def scanner(body):
    @jax.jit
    def f(pose7):
        c, _ = jax.lax.scan(lambda c, _: (body(c), ()), pose7, None, length=K)
        return c
    return f

pose = poses.pose(0)
fs = [("bwd-to-attrs (pallas only) ", scanner(fb_attrs)),
      ("bwd-to-pose  (full chain)  ", scanner(fb_full))]
for _, f in fs:
    jax.block_until_ready(f(pose))
for trial in range(2):
    for tag, f in fs:
        p = pose + 1e-6 * (trial + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(f(p))
        print(f"{tag} t{trial}: {(time.perf_counter()-t0)/K*1e3:6.1f} ms/iter")
