"""Per-stage FLOP breakdown of the nightmare_v3 env step (XLA cost analysis).

On the FLOP-bound dev backend (~50 GFLOP/s), FLOPs/env/substep IS the
throughput model — this identifies which stage to shrink next.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.ops import linalg
from nightmare_rl_tpu.physics import collision, dynamics, kinematics, pipeline, solver


def flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    a = c.cost_analysis()
    if isinstance(a, list):
        a = a[0]
    return a.get("flops", float("nan"))


cfg = NightmareV3Cfg().replace(env=EnvCfg(num_envs=1))
env = NightmareV3Env(cfg)
sys = env.sys
state = pipeline.make_state(sys)
ctrl = jnp.zeros(sys.nu, sys.dtype)

print(f"nv={sys.nv} nbody={sys.nbody} ncp={sys.ncp} "
      f"max_contacts={sys.max_contacts} iter={sys.solver_iterations} "
      f"noslip={sys.noslip_iterations}")

kin = kinematics.kinematics(sys, state.qpos)
vel = kinematics.com_vel(sys, kin, state.qvel)
M = dynamics.crb(sys, kin)
Mch = linalg.chol(M)
a0 = jnp.zeros(sys.nv, sys.dtype)
con = collision.find_contacts(sys, kin)
pair = None
if sys.max_pair_contacts > 0 and len(sys.cpair_a) > 0:
    pair = collision.find_pair_contacts(sys, kin, con)

print("kinematics      :", flops(lambda q: kinematics.kinematics(sys, q), state.qpos))
print("com_vel         :", flops(lambda k, v: kinematics.com_vel(sys, k, v), kin, state.qvel))
print("crb             :", flops(lambda k: dynamics.crb(sys, k), kin))
print("chol(M)         :", flops(linalg.chol, M))
print("rne_bias        :", flops(lambda k, v, qv: dynamics.rne_bias(sys, k, v, qv), kin, vel, state.qvel))
print("actuation       :", flops(lambda q, v, c: dynamics.actuation(sys, q, v, c).qfrc_actuator, state.qpos, state.qvel, ctrl))
print("find_contacts   :", flops(lambda k: collision.find_contacts(sys, k), kin))
if pair is not None:
    print("find_pairs      :", flops(lambda k, c: collision.find_pair_contacts(sys, k, c), kin, con))
from nightmare_rl_tpu.physics import arrow  # noqa: E402

lay = arrow.layout(sys)
fac = arrow.factor(lay, M) if lay is not None else None
for mode in ("legs", "scan"):
    os.environ["NIGHTMARE_PGS"] = mode
    print(f"solve_contacts ({mode:4s}):", flops(
        lambda c, q, v, mc, a, p: solver.solve_contacts(
            sys, c, q, v, mc, a, pair=p, M=None, lay=lay, fac=fac),
        con, state.qpos, state.qvel, Mch, a0, pair))
del os.environ["NIGHTMARE_PGS"]
print("full substep    :", flops(lambda s, c: pipeline.step(sys, s, c, 1), state, ctrl))
print("full ctrl step  :", flops(lambda s, c: pipeline.step(sys, s, c, 2), state, ctrl))

# and the whole env step (1 env)
es = env._init_batch(jax.random.split(jax.random.PRNGKey(0), 1))
acts = jnp.zeros((1, env.num_actions))
print("env step (1 env):", flops(env._step_batch, es, acts))

nefc = None
asm = solver.assemble(sys, con, state.qpos, state.qvel, pair=pair)
print("nefc rows:", asm.efc.J.shape[0], " ns_offset:", asm.ns_offset)
