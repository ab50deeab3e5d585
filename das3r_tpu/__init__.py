"""DAS3R-TPU: a TPU-native framework for dynamics-aware Gaussian-splat
static-scene reconstruction from unposed dynamic monocular video.

Re-designed from scratch for JAX/XLA/Pallas on TPU with the capability set of
kai422/DAS3R (arXiv 2412.19584):

  stage 1 (``das3r_tpu.models``): a DUSt3R-style pairwise pointmap transformer
  with dynamic-mask DPT heads plus a jit-compiled global-alignment optimizer
  producing per-frame depth / confidence / dynamic-ness maps, intrinsics and a
  camera trajectory.

  stage 2 (``das3r_tpu.train``): per-scene 3D Gaussian splatting with learnable
  camera poses and a learnable per-pixel static-confidence map, rendered by a
  tile-based differentiable rasterizer (``das3r_tpu.ops.splat``) built on
  XLA + Pallas instead of the reference's CUDA ``diff-gaussian-rasterization``.

Everything in the compute path is functional, statically shaped, and jit-able;
multi-chip scaling goes through ``das3r_tpu.parallel`` (jax.sharding Mesh).
"""

__version__ = "0.1.0"
