from stable_virtual_camera_tpu.utils import video

__all__ = ["video"]
