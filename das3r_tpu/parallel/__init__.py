from das3r_tpu.parallel.mesh import make_mesh
from das3r_tpu.parallel import sharded
