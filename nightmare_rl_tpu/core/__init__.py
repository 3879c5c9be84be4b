from nightmare_rl_tpu.core import quat, spatial

__all__ = ["quat", "spatial"]
