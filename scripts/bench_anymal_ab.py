"""A/B bench for the Newton line-search rewrite (commit ea2a554).

The rewrite replaced the sequential expand+guarded-Newton line search
(~60 chained φ' evaluations per Newton iteration) with an analytically
bracketed log-grid + short refinement (~9 chained evaluations).  Its 4x
throughput claim landed as a code comment with no measurement — this script
produces the measurement on the anymal_c env (Newton + elliptic cones, the
solver the rewrite targets).

    python scripts/bench_anymal_ab.py            # current line search
    NEWTON_SRC=/tmp/newton_old.py python scripts/bench_anymal_ab.py   # old

where /tmp/newton_old.py is e.g.
    git show ea2a554~1:nightmare_rl_tpu/physics/newton.py

Prints env-steps/s for the full env step (physics x decimation + obs +
rewards + resets) with random actions, same protocol as bench.py's env
measurement.
"""

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import nightmare_rl_tpu.physics.solver as solver_mod

src = os.environ.get("NEWTON_SRC")
if src:
    spec = importlib.util.spec_from_file_location("newton_ab_variant", src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    solver_mod.newton = mod  # solver resolves `newton.*` at call time
    print(f"newton variant: {src}")
else:
    print("newton variant: current tree")

from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv  # noqa: E402

NUM_ENVS = int(os.environ.get("AB_ENVS", "2048"))
STEPS = 10

env = AnymalCEnv(AnymalCCfg(num_envs=NUM_ENVS))
state = env.init(0)
key = jax.random.PRNGKey(0)


@jax.jit
def rollout(state, key):
    def body(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        actions = 0.3 * jax.random.normal(k, (NUM_ENVS, env.num_actions))
        out = env._step_batch(state, actions)
        return (out.state, key), out.reward.sum()

    (state, key), rew = jax.lax.scan(body, (state, key), None, length=STEPS)
    return state, key, rew.sum()


t0 = time.perf_counter()
state, key, r = rollout(state, key)
float(r)
print(f"compile+first: {time.perf_counter() - t0:.1f} s")

best = 0.0
for rep in range(4):
    t0 = time.perf_counter()
    state, key, r = rollout(state, key)
    float(r)
    wall = time.perf_counter() - t0
    rate = NUM_ENVS * STEPS / wall
    best = max(best, rate)
    print(f"rep {rep}: env-steps/s={rate:,.0f}  wall={wall * 1e3:.0f} ms")
print(f"BEST: envs={NUM_ENVS} env-steps/s={best:,.0f}")
