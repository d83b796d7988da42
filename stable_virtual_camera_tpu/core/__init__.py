from stable_virtual_camera_tpu.core import camera, normalize, plucker, trajectories

__all__ = ["camera", "normalize", "plucker", "trajectories"]
