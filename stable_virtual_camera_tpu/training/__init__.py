from stable_virtual_camera_tpu.training import train_step

__all__ = ["train_step"]
