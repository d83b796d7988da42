from stable_virtual_camera_tpu.parallel import mesh, sharding

__all__ = ["mesh", "sharding"]
