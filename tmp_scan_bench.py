"""Chip-throughput probe: K fwd+bwd iterations chained in ONE lax.scan
dispatch (carry-dependent => sequential real compute), vs per-dispatch loop."""
import time
import jax, jax.numpy as jnp

N, H, W = 100_000, 384, 512
from das3r_tpu.data.synthetic import random_gaussian_scene
from das3r_tpu.models import render as render_mod
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.train import loss as loss_mod

settings = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                          max_per_tile=1024, max_tiles_per_gaussian=32,
                          max_total_entries=8 * N, depth_sort_bits=0)
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

K = 30
@jax.jit
def scan_k(pose7):
    def body(c, _):
        return one(c), ()
    c, _ = jax.lax.scan(body, pose7, None, length=K)
    return c

pose = poses.pose(0)
w = scan_k(pose); jax.block_until_ready(w)
for trial in range(3):
    p = pose + 1e-6 * (trial + 1)
    t0 = time.perf_counter()
    r = scan_k(p)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / K
    print(f"scan-of-{K} t{trial}: {dt*1e3:.1f} ms/iter ({H*W/dt/1e6:.2f} Mpix/s)  [chk {float(jnp.sum(r)):.3e}]")
