from nightmare_rl_tpu.rl.ppo import PPO, TrainState
from nightmare_rl_tpu.rl.runner import OnPolicyRunner, get_load_path

__all__ = ["PPO", "TrainState", "OnPolicyRunner", "get_load_path"]
