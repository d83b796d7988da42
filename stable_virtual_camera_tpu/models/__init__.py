from stable_virtual_camera_tpu.models import unet

__all__ = ["unet"]
