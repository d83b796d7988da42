from stable_virtual_camera_tpu.ops import attention, resize

__all__ = ["attention", "resize"]
