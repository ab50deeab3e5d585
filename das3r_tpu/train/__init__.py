from das3r_tpu.train import (checkpoint, config, loss, optim, scene_setup,
                             step, trainer)
