from das3r_tpu.data import colmap, ply, readers, rearrange, trajectory
