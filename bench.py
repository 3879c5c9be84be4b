"""Headline benchmark: nightmare_v3 throughput on one TPU chip.

Two measurements:
1. full PPO training iteration (80-step rollout + GAE + 5x4 minibatch
   update, the whole thing one XLA program) — what training actually runs;
2. the FULL env step alone (batched physics ×decimation + observations +
   rewards + terminations + masked resets) at 4096 parallel envs with
   random actions.

Prints one JSON line per metric; the headline env-step line is printed LAST
(the driver records the final line).  vs_baseline compares raw physics
substeps/s against the reference's simple_test.py measurement in this
container (71,308 mj_step substeps/s — BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp

from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.utils.compile_cache import (
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

NUM_ENVS = 4096
STEPS = 20
BASELINE_PHYS_STEPS_PER_S = 71_308.0


PPO_ENVS = 2048  # the training CLI's default scale (reference train.py:12)


def bench_ppo_iteration() -> None:
    """Full PPO iteration (rollout+GAE+update, one XLA program) at the
    training configuration, measured the way training experiences it: a
    sustained window with a per-iteration scalar fetch (exactly what the
    runner does for its metrics).  Short probes through the axon tunnel are
    at the mercy of 1.4-14 s dispatch-latency swings for the identical
    program (BENCH_NOTES round 3), so the window is wide: after compile and
    a 3-iteration drain, iterate until >=45 s of wall time AND >=20
    iterations (capped at 120) and report the sustained rate — this matches
    the training-telemetry numbers instead of sitting 5x under them."""
    from nightmare_rl_tpu.rl.ppo import PPO

    env = NightmareV3Env(
        NightmareV3Cfg().replace(env=EnvCfg(num_envs=PPO_ENVS))
    )
    decimation = env.cfg.control.decimation
    ppo = PPO(env, PPOCfg())
    ts = ppo.init(0)
    ts, stats = ppo.learn_step(ts)     # compile
    float(stats["loss"])
    for _ in range(3):                 # drain the tunnel before timing
        ts, stats = ppo.learn_step(ts)
        float(stats["loss"])
    t0 = time.perf_counter()
    iters = 0
    while True:
        ts, stats = ppo.learn_step(ts)
        float(stats["loss"])           # honest device sync per iteration
        iters += 1
        wall = time.perf_counter() - t0
        if (wall >= 45.0 and iters >= 20) or iters >= 120:
            break
    steps = iters * 80 * env.num_envs
    print(
        json.dumps(
            {
                "metric": f"ppo_iter_env_steps_per_s_{PPO_ENVS}envs_1chip",
                "value": round(steps / wall, 1),
                "unit": "env-steps/s",
                "iters": iters,
                "window_s": round(wall, 1),
                "vs_baseline": round(
                    steps / wall * decimation / BASELINE_PHYS_STEPS_PER_S, 3
                ),
            }
        )
    )


def main() -> None:
    cfg = NightmareV3Cfg().replace(env=EnvCfg(num_envs=NUM_ENVS))
    env = NightmareV3Env(cfg)
    bench_ppo_iteration()

    state = env.init(0)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.normal(k, (NUM_ENVS, env.num_actions))
            out = env._step_batch(state, actions)
            return (out.state, key), out.reward.sum()

        (state, key), rew = jax.lax.scan(body, (state, key), None, length=STEPS)
        return state, key, rew.sum()

    # warmup / compile; NB force a scalar fetch — block_until_ready does not
    # reliably block on the axon platform
    state, key, r = rollout(state, key)
    float(r)

    t0 = time.perf_counter()
    state, key, r = rollout(state, key)
    float(r)
    wall = time.perf_counter() - t0

    env_steps = NUM_ENVS * STEPS
    env_rate = env_steps / wall
    phys_rate = env_rate * cfg.control.decimation
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_4096envs_1chip",
                "value": round(env_rate, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(phys_rate / BASELINE_PHYS_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
