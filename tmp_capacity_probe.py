"""What does the bench scene actually need? (ntt, entries, per-tile max)"""
import jax, jax.numpy as jnp
import numpy as np
N, H, W = 100_000, 384, 512
from das3r_tpu.data.synthetic import random_gaussian_scene
import das3r_tpu.models.render as R
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.ops.splat.preprocess import preprocess
from das3r_tpu.ops.splat.binning import bin_gaussians
from das3r_tpu.models.gaussians import activated_opacity

s = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                   max_per_tile=1024, max_tiles_per_gaussian=32,
                   max_total_entries=8 * N, depth_sort_bits=0)
params, meta, poses = random_gaussian_scene(n=N, n_frames=2, height=H,
                                            width=W, seed=0)
fov = jnp.asarray(1.0, jnp.float32)

@jax.jit
def stats(pose7):
    safe_rot = jnp.where(meta.alive[:, None], params.rotation,
                         jnp.asarray([1.0, 0, 0, 0]))
    p = params._replace(rotation=safe_rot)
    xyz_cam, rot_cam = R._camera_frame_gaussians(p, pose7)
    view, proj, campos, tanx, tany = R._raster_common(fov, fov)
    opac = activated_opacity(p) * meta.alive[:, None]
    prep = preprocess(xyz_cam, opac, s,
                      viewmatrix=view, projmatrix=proj, campos=campos,
                      shs=jnp.concatenate([p.features_dc, p.features_rest], 1),
                      scales=jnp.exp(p.scaling), rotations=rot_cam,
                      tan_fovx=tanx, tan_fovy=tany)
    bins = bin_gaussians(prep, s)
    ntt = jnp.where(prep.binnable, prep.n_tiles_touched, 0)
    return (ntt.max(), jnp.sum(ntt), bins.full_count.max(),
            jnp.percentile(bins.full_count.astype(jnp.float32), 99),
            prep.binnable.sum())

mx, tot, ptmax, pt99, nbin = stats(poses.pose(0))
print(f"binnable={int(nbin)}  max_ntt={int(mx)}  total_entries={int(tot)}"
      f"  per-tile max={int(ptmax)}  p99={float(pt99):.0f}")
