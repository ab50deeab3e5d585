from das3r_tpu.predictor import alignment, pairs, warping
