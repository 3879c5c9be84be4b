from nightmare_rl_tpu.physics.system import System, State

__all__ = ["System", "State"]
