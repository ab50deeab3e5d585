from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D, DUST3R_LARGE_CONFIG
