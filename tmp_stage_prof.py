"""Stage profile via nested jits (chained varying inputs)."""
import time
import jax, jax.numpy as jnp

N, H, W, ITERS = 100_000, 384, 512, 15
from das3r_tpu.data.synthetic import random_gaussian_scene
from das3r_tpu.models import render as render_mod
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.ops.splat import rasterize as rast_mod
from das3r_tpu.ops.splat.preprocess import preprocess
from das3r_tpu.ops.splat.binning import bin_gaussians
from das3r_tpu.train import loss as loss_mod
from das3r_tpu.models.gaussians import activated_opacity
from das3r_tpu.utils.quat import pose_to_w2c
from das3r_tpu.utils import transforms

settings = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                          max_per_tile=1024, max_tiles_per_gaussian=32,
                          max_total_entries=8 * N, depth_sort_bits=0)
params, meta, poses = random_gaussian_scene(n=N, n_frames=2, height=H,
                                            width=W, seed=0)
bg = jnp.zeros(3)
fov = jnp.asarray(1.0, jnp.float32)
gt = jnp.zeros((3, H, W))

def full_loss(params, pose7):
    out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                            mode="train")
    return loss_mod.photometric_loss(out.image, gt,
                                     params.conf_static[0]).loss

def fwd_only(params, pose7):
    out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                            mode="train")
    return out.image.sum()

def prep_and_bin(params, pose7):
    out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                            mode="train")
    return out  # not used; see below

# surgical: call internals the way render does
import das3r_tpu.models.render as R
def stages(params, pose7, upto):
    # mimic render() internals enough to isolate preprocess+binning
    safe_rot = jnp.where(meta.alive[:, None], params.rotation,
                         jnp.asarray([1.0, 0, 0, 0]))
    p = params._replace(rotation=safe_rot)
    xyz_cam, rot_cam = R._camera_frame_gaussians(p, pose7)
    view, proj, campos, tanx, tany = R._raster_common(fov, fov)
    opac = activated_opacity(p) * meta.alive[:, None]
    prep = preprocess(xyz_cam, opac, settings,
                      viewmatrix=view, projmatrix=proj,
                      campos=campos,
                      shs=jnp.concatenate([p.features_dc, p.features_rest], 1),
                      scales=jnp.exp(p.scaling), rotations=rot_cam,
                      tan_fovx=tanx, tan_fovy=tany)
    if upto == "prep":
        return prep.depth.sum() + prep.rect_min.sum()
    bins = bin_gaussians(prep, settings)
    return bins.gid.sum() + bins.count.sum()

f_prep = jax.jit(lambda pr, po: stages(pr, po, "prep"))
f_bin = jax.jit(lambda pr, po: stages(pr, po, "bin"))
f_fwd = jax.jit(lambda pr, po: fwd_only(pr, po))
f_fb = jax.jit(lambda pr, po: jax.grad(full_loss, argnums=1)(pr, po))

pose = poses.pose(0)
for f in (f_prep, f_bin, f_fwd, f_fb):
    jax.block_until_ready(f(params, pose))

def bench(f, tag):
    p = pose + 1e-6
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = f(params, p)
        p = pose + 1e-14 * jnp.sum(r).astype(jnp.float32)
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: {dt*1e3:.1f} ms")
    return dt

for t in range(1):
    a = bench(f_prep, f"  preprocess          t{t}")
    b = bench(f_bin,  f"  preprocess+binning  t{t}")
    c = bench(f_fwd,  f"  full forward        t{t}")
    d = bench(f_fb,   f"  full fwd+bwd        t{t}")
    print(f"  => binning ~{(b-a)*1e3:.1f} ms, blend fwd ~{(c-b)*1e3:.1f} ms, bwd ~{(d-c)*1e3:.1f} ms")
