from stable_virtual_camera_tpu.engine import planner, prior

__all__ = ["planner", "prior"]
