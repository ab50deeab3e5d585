"""Same-window A/B: qdepth-22 pair-sort vs payload-free rank binning,
full train-step fwd+bwd (bench.py protocol, chained varying inputs)."""
import time
import jax, jax.numpy as jnp

N, H, W, ITERS = 100_000, 384, 512, 15

from das3r_tpu.data.synthetic import random_gaussian_scene
from das3r_tpu.models import render as render_mod
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.train import loss as loss_mod

common = dict(image_height=H, image_width=W, sh_degree=3, max_per_tile=1024,
              max_tiles_per_gaussian=32, max_total_entries=8 * N)
variants = {
    "qdepth22": RasterSettings(**common, depth_sort_bits=22),
    "rank-nopayload": RasterSettings(**common, depth_sort_bits=0),
}
params, meta, poses = random_gaussian_scene(n=N, n_frames=2, height=H,
                                            width=W, seed=0)
bg = jnp.zeros(3)
fov = jnp.asarray(1.0, jnp.float32)
gt = jnp.zeros((3, H, W))

steps = {}
for name, settings in variants.items():
    def loss_fn(params, pose7, settings=settings):
        out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                                mode="train")
        return loss_mod.photometric_loss(out.image, gt,
                                         params.conf_static[0]).loss
    @jax.jit
    def step(params, pose7, loss_fn=loss_fn):
        g_params, g_pose = jax.grad(loss_fn, argnums=(0, 1))(params, pose7)
        feedback = 1e-12 * (jnp.sum(g_pose) + jnp.sum(g_params.xyz))
        return g_params, pose7 + feedback
    steps[name] = step

pose = poses.pose(0)
for name, step in steps.items():
    _, pw = step(params, pose)
    jax.block_until_ready(pw)

for trial in range(3):
    line = []
    for name, step in steps.items():
        p = pose + 1e-6 * (trial + 1)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            g, p = step(params, p)
        jax.block_until_ready((g, p))
        dt = (time.perf_counter() - t0) / ITERS
        line.append(f"{name}: {dt*1e3:.0f} ms ({H*W/dt/1e6:.2f} Mpix/s)")
    print(f"t{trial}  " + "  |  ".join(line))
