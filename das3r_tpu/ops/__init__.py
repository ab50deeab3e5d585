from das3r_tpu.ops import knn, splat
