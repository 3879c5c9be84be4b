"""Throughput vs env-batch size on the real TPU chip.

Separates FLOP-bound from op-overhead-bound regimes: if env-steps/s keeps
rising with the batch, per-op dispatch overhead (not FLOPs) is the binding
constraint and the headline bench should run at the larger batch.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env

STEPS = 20

for num_envs in (2048, 4096, 8192, 16384):
    cfg = NightmareV3Cfg().replace(env=EnvCfg(num_envs=num_envs))
    env = NightmareV3Env(cfg)
    state = env.init(0)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def rollout(state, key, env=env, num_envs=num_envs):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.normal(k, (num_envs, env.num_actions))
            out = env._step_batch(state, actions)
            return (out.state, key), out.reward.sum()

        (state, key), rew = jax.lax.scan(body, (state, key), None, length=STEPS)
        return state, key, rew.sum()

    state, key, r = rollout(state, key)
    float(r)
    t0 = time.perf_counter()
    state, key, r = rollout(state, key)
    float(r)
    wall = time.perf_counter() - t0
    print(f"envs={num_envs:6d}  env-steps/s={num_envs * STEPS / wall:,.0f}  "
          f"wall={wall * 1e3:.1f} ms")
