from das3r_tpu.eval import masks, trajectory
