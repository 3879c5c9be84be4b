"""Wall-time ablation of the env step on the real TPU chip.

Times jitted 20-step scans of progressively larger slices of the substep at
4096 envs: smooth dynamics only -> + contact row assembly -> + Delassus
build -> full solve.  Differences localize the wall-clock (FLOP counts said
the solver; this measures it).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.ops import linalg
from nightmare_rl_tpu.physics import arrow, collision, dynamics, kinematics, solver
from nightmare_rl_tpu.physics import pipeline

N, STEPS = 4096, 20
cfg = NightmareV3Cfg().replace(env=EnvCfg(num_envs=N))
env = NightmareV3Env(cfg)
sys_ = env.sys
state0 = jax.vmap(lambda _: pipeline.make_state(sys_))(jnp.arange(N))
lay = arrow.layout(sys_)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.asarray(out).sum())
    t0 = time.perf_counter()
    out = f(*args)
    float(jnp.asarray(out).sum())
    dt = time.perf_counter() - t0
    print(f"{name:24s}: {dt * 1e3 / STEPS:8.2f} ms/iter")


def smooth_only(state):
    def one(qpos, qvel):
        kin = kinematics.kinematics(sys_, qpos)
        vel = kinematics.com_vel(sys_, kin, qvel)
        M = dynamics.crb(sys_, kin)
        bias = dynamics.rne_bias(sys_, kin, vel, qvel)
        fac = arrow.factor(lay, M)
        qacc = arrow.solve_vec(lay, fac, -bias)
        Minv = arrow.inv(lay, fac)
        return qacc + Minv[:, 0]

    def body(c, _):
        q = jax.vmap(one)(state.qpos, state.qvel)
        return c + q.sum(), None

    return jax.lax.scan(body, 0.0, None, length=STEPS)[0]


def rows_only(state):
    def one(qpos, qvel):
        kin = kinematics.kinematics(sys_, qpos)
        con = collision.find_contacts(sys_, kin)
        pair = collision.find_pair_contacts(sys_, kin, con)
        asm = solver.assemble(sys_, con, qpos, qvel, pair=pair)
        return asm.efc.J.sum() + asm.efc.aref.sum()

    def body(c, _):
        q = jax.vmap(one)(state.qpos, state.qvel)
        return c + q.sum(), None

    return jax.lax.scan(body, 0.0, None, length=STEPS)[0]


def delassus(state):
    def one(qpos, qvel):
        kin = kinematics.kinematics(sys_, qpos)
        M = dynamics.crb(sys_, kin)
        fac = arrow.factor(lay, M)
        Minv = arrow.inv(lay, fac)
        con = collision.find_contacts(sys_, kin)
        pair = collision.find_pair_contacts(sys_, kin, con)
        asm = solver.assemble(sys_, con, qpos, qvel, pair=pair)
        JMinv = asm.efc.J @ Minv
        A = jnp.einsum("ik,jk->ij", JMinv, asm.efc.J)
        return A.sum()

    def body(c, _):
        q = jax.vmap(one)(state.qpos, state.qvel)
        return c + q.sum(), None

    return jax.lax.scan(body, 0.0, None, length=STEPS)[0]


def full_solve(state):
    """Everything the substep's dynamics does: smooth + rows + matrix-free
    PGS (the Delassus matrix is no longer built in the hot path; the
    `delassus` stage above times the old explicit build for comparison)."""
    def one(qpos, qvel, ctrl):
        st = state_template._replace(qpos=qpos, qvel=qvel)
        return pipeline.forward(sys_, st, ctrl).sol.qacc.sum()

    state_template = pipeline.make_state(sys_)

    def body(c, _):
        q = jax.vmap(one, in_axes=(0, 0, None))(
            state.qpos, state.qvel, jnp.zeros(sys_.nu, sys_.dtype)
        )
        return c + q.sum(), None

    return jax.lax.scan(body, 0.0, None, length=STEPS)[0]


timed("smooth dynamics", smooth_only, state0)
timed("+ contact rows", rows_only, state0)
timed("+ delassus build", delassus, state0)
timed("+ full solve", full_solve, state0)


def full_env(state, key):
    def body(carry, _):
        st, key = carry
        key, k = jax.random.split(key)
        a = jax.random.normal(k, (N, env.num_actions))
        out = env._step_batch(st, a)
        return (out.state, key), None

    (st, _), _ = jax.lax.scan(body, (state, key), None, length=STEPS)
    return st.phys.qpos.sum()


timed("full env step", full_env, env.init(0), jax.random.PRNGKey(0))
