from das3r_tpu.train import config, loss, optim, step
