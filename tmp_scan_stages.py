"""Per-stage timing, each stage chained K times inside one scan dispatch."""
import time
import jax, jax.numpy as jnp

N, H, W, K = 100_000, 384, 512, 30
from das3r_tpu.data.synthetic import random_gaussian_scene
from das3r_tpu.models import render as render_mod
import das3r_tpu.models.render as R
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.ops.splat.preprocess import preprocess
from das3r_tpu.ops.splat.binning import bin_gaussians
from das3r_tpu.ops.splat.rasterize import rasterize
from das3r_tpu.train import loss as loss_mod
from das3r_tpu.models.gaussians import activated_opacity

settings = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                          max_per_tile=1024, max_tiles_per_gaussian=32,
                          max_total_entries=8 * N, depth_sort_bits=0)
params, meta, poses = random_gaussian_scene(n=N, n_frames=2, height=H,
                                            width=W, seed=0)
bg = jnp.zeros(3); fov = jnp.asarray(1.0, jnp.float32)
gt = jnp.zeros((3, H, W))

def make_prep(pose7):
    safe_rot = jnp.where(meta.alive[:, None], params.rotation,
                         jnp.asarray([1.0, 0, 0, 0]))
    p = params._replace(rotation=safe_rot)
    xyz_cam, rot_cam = R._camera_frame_gaussians(p, pose7)
    view, proj, campos, tanx, tany = R._raster_common(fov, fov)
    opac = activated_opacity(p) * meta.alive[:, None]
    return preprocess(xyz_cam, opac, settings,
                      viewmatrix=view, projmatrix=proj, campos=campos,
                      shs=jnp.concatenate([p.features_dc, p.features_rest], 1),
                      scales=jnp.exp(p.scaling), rotations=rot_cam,
                      tan_fovx=tanx, tan_fovy=tany)

def st_prep(pose7):
    pr = make_prep(pose7)
    return pose7 + 1e-20 * (pr.depth.sum() + pr.mean2d.sum())

def st_bin(pose7):
    pr = make_prep(pose7)
    b = bin_gaussians(pr, settings)
    return pose7 + 1e-20 * (b.gid.sum() + b.count.sum()).astype(jnp.float32)

def st_fwd(pose7):
    out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                            mode="train")
    return pose7 + 1e-20 * out.image.sum()

def loss_fn(params, pose7):
    out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                            mode="train")
    return loss_mod.photometric_loss(out.image, gt,
                                     params.conf_static[0]).loss

def st_fb(pose7):
    g_params, g_pose = jax.grad(loss_fn, argnums=(0, 1))(params, pose7)
    return pose7 + 1e-12 * (jnp.sum(g_pose) + jnp.sum(g_params.xyz))

def scanner(body):
    @jax.jit
    def f(pose7):
        c, _ = jax.lax.scan(lambda c, _: (body(c), ()), pose7, None, length=K)
        return c
    return f

pose = poses.pose(0)
fs = [("preprocess ", scanner(st_prep)), ("prep+bin   ", scanner(st_bin)),
      ("forward    ", scanner(st_fwd)), ("fwd+bwd    ", scanner(st_fb))]
for tag, f in fs:
    jax.block_until_ready(f(pose))
for trial in range(2):
    for tag, f in fs:
        p = pose + 1e-6 * (trial + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(f(p))
        dt = (time.perf_counter() - t0) / K
        print(f"{tag} t{trial}: {dt*1e3:.1f} ms/iter")
