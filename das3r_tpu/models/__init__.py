from das3r_tpu.models.gaussians import (
    GaussianParams, PoseParams, TestPoseParams, GaussianMeta, GaussianScene,
    init_from_frames, activated_opacity, activated_scaling, per_gaussian_conf,
)
from das3r_tpu.models import render
