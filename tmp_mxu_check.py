"""On-TPU: parity vs float64 oracle + scan-bench A/B after MXU scan swap."""
import time
import numpy as np
import jax, jax.numpy as jnp

# -- parity: small scene vs reference oracle
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.ops.splat.rasterize import rasterize
from das3r_tpu.ops.splat.reference import rasterize_reference
rng = np.random.default_rng(3)
n = 400
s = RasterSettings(image_height=64, image_width=96, sh_degree=0,
                   max_per_tile=128, max_tiles_per_gaussian=24)
xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.6 + [0, 0, 3.0]
scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.5).astype(np.float32)
q = rng.normal(size=(n, 4)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
op = (1 / (1 + np.exp(-rng.normal(size=(n, 1))))).astype(np.float32)
colors = rng.random((n, 3)).astype(np.float32)
import das3r_tpu.utils.transforms as tf
fovx = fovy = 0.9
proj = np.asarray(tf.projection_matrix(0.01, 100.0, fovx, fovy)).T
view = np.eye(4, dtype=np.float32)
img, _, _ = rasterize(
    jnp.asarray(xyz), jnp.asarray(op), s,
    viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
    campos=jnp.zeros(3), bg=jnp.zeros(3),
    tan_fovx=float(np.tan(fovx/2)), tan_fovy=float(np.tan(fovy/2)),
    colors_precomp=jnp.asarray(colors), scales=jnp.asarray(scales),
    rotations=jnp.asarray(q), backend="pallas")
ref, _ = rasterize_reference(
    xyz, op, s, viewmatrix=view, projmatrix=proj, campos=np.zeros(3),
    bg=np.zeros(3), tan_fovx=float(np.tan(fovx/2)),
    tan_fovy=float(np.tan(fovy/2)), colors_precomp=colors,
    scales=scales, rotations=q)
err = float(np.abs(np.asarray(img) - np.asarray(ref)).max())
print(f"TPU pallas vs float64 oracle: max err {err:.2e}")
assert err < 5e-5, err

# -- perf: scan bench
N, H, W, K = 100_000, 384, 512, 30
from das3r_tpu.data.synthetic import random_gaussian_scene
from das3r_tpu.models import render as render_mod
from das3r_tpu.train import loss as loss_mod
settings = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                          max_per_tile=1024, max_tiles_per_gaussian=32,
                          max_total_entries=8 * N)
params, meta, poses = random_gaussian_scene(n=N, n_frames=2, height=H,
                                            width=W, seed=0)
bg = jnp.zeros(3); fov = jnp.asarray(1.0, jnp.float32)
gt = jnp.zeros((3, H, W))
def loss_fn(params, pose7):
    out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                            mode="train")
    return loss_mod.photometric_loss(out.image, gt,
                                     params.conf_static[0]).loss
def one(pose7):
    g_params, g_pose = jax.grad(loss_fn, argnums=(0, 1))(params, pose7)
    return pose7 + 1e-12 * (jnp.sum(g_pose) + jnp.sum(g_params.xyz))
@jax.jit
def chain(pose7):
    c, _ = jax.lax.scan(lambda c, _: (one(c), ()), pose7, None, length=K)
    return c
pose = poses.pose(0)
jax.block_until_ready(chain(pose))
for trial in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(chain(pose + 1e-6 * (trial + 1)))
    dt = (time.perf_counter() - t0) / K
    print(f"mxu-scan t{trial}: {dt*1e3:.1f} ms/iter ({H*W/dt/1e6:.2f} Mpix/s)")
