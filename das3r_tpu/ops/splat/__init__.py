from das3r_tpu.ops.splat.settings import RasterSettings
from das3r_tpu.ops.splat.rasterize import RasterAux, rasterize
from das3r_tpu.ops.splat.preprocess import Preprocessed, build_cov3d, preprocess
from das3r_tpu.ops.splat.binning import TileBins, bin_gaussians
from das3r_tpu.ops.splat.blend import BlendInputs, blend_tiles
