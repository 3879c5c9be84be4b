"""Measure how many Newton iterations the warmstarted anymal solve needs.

For each step of a driven rollout, solve the SAME constraint state at
solver_iterations in {1,2,3,4,8} (warmstarted with the rollout's previous
qacc, like training does) and compare qacc against a converged reference
(30 iterations).  This is per-step solver error, free of trajectory
divergence — the honest basis for choosing AnymalCCfg.solver_iterations.

    JAX_PLATFORMS=cpu python scripts/probe_warmstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from nightmare_rl_tpu.physics import loader, pipeline

N_ENVS = 16
N_STEPS = 60
BUDGETS = (1, 2, 3, 4, 8)
REF_ITERS = 30

sys_ref = loader.load_system("anymal_c", dtype=jnp.float32)
sys_ref = dataclasses.replace(sys_ref, solver_iterations=REF_ITERS)
systems = {
    k: dataclasses.replace(sys_ref, solver_iterations=k) for k in BUDGETS
}

rng = np.random.default_rng(3)
st0 = pipeline.make_state(sys_ref)
qpos = np.tile(np.asarray(st0.qpos), (N_ENVS, 1))
qpos[:, 7:] += rng.uniform(-0.05, 0.05, qpos[:, 7:].shape)
state = jax.vmap(lambda q: st0.replace(qpos=q))(jnp.asarray(qpos, jnp.float32))

ctrl0 = jnp.asarray(np.asarray(st0.qpos)[7:], jnp.float32)


def rollout_errors(state):
    """Advance with the REFERENCE system; at each step, also solve the same
    state at every budget (warmstarted with the carried qacc_warmstart) and
    record qacc errors."""

    def step_fn(state, key):
        ctrl = ctrl0 + 0.1 * jax.random.normal(key, (N_ENVS, sys_ref.nu))

        def fwd_one(sys_k, st, c):
            return pipeline.forward(sys_k, st, c).sol.qacc

        qacc_ref = jax.vmap(lambda st, c: fwd_one(sys_ref, st, c))(state, ctrl)
        errs = []
        for k in BUDGETS:
            qacc_k = jax.vmap(lambda st, c: fwd_one(systems[k], st, c))(
                state, ctrl)
            errs.append(jnp.max(jnp.abs(qacc_k - qacc_ref)
                                / (1.0 + jnp.abs(qacc_ref))))
        state = jax.vmap(lambda st, c: pipeline.step(sys_ref, st, c, 1))(
            state, ctrl)
        return state, jnp.stack(errs)

    keys = jax.random.split(jax.random.PRNGKey(0), N_STEPS)
    _, errs = jax.lax.scan(step_fn, state, keys)
    return errs  # (N_STEPS, len(BUDGETS))


errs = np.asarray(jax.jit(rollout_errors)(state))
print(f"max relative qacc err vs {REF_ITERS}-iteration converged solve, "
      f"{N_ENVS} envs x {N_STEPS} warmstarted steps:")
for i, k in enumerate(BUDGETS):
    e = errs[5:, i]  # skip the first cold-start frames
    print(f"  iterations={k}: max={e.max():.3e}  p99={np.quantile(e, 0.99):.3e}"
          f"  median={np.median(e):.3e}")
