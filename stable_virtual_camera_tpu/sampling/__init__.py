from stable_virtual_camera_tpu.sampling import discretization, guidance, sampler

__all__ = ["discretization", "guidance", "sampler"]
