from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv

__all__ = ["NightmareV3Env", "AnymalCEnv", "AnymalCCfg"]
