from das3r_tpu.utils import quat, transforms, sh, geometry, image, schedules
