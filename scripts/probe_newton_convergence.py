"""Trace Newton cost/error per iteration on the worst frames of a driven
anymal rollout — diagnoses WHY the fixed-budget solve is slow to converge
(zone chatter? line-search under-resolution? stiff impratio=100 rows?).

    JAX_PLATFORMS=cpu python scripts/probe_newton_convergence.py
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

from nightmare_rl_tpu.physics import loader, pipeline, solver, newton

sys_r = loader.load_system("anymal_c", dtype=jnp.float32)

# drive one env with noisy ctrl; find the frame where iters=8 vs iters=30
# disagree most
rng = np.random.default_rng(3)
st = pipeline.make_state(sys_r)
q = np.asarray(st.qpos).copy()
q[7:] += rng.uniform(-0.05, 0.05, q[7:].shape)
st = st.replace(qpos=jnp.asarray(q, jnp.float32))
ctrl0 = jnp.asarray(q[7:], jnp.float32)

sys8 = dataclasses.replace(sys_r, solver_iterations=8)
sys30 = dataclasses.replace(sys_r, solver_iterations=30)

states, ctrls = [], []
for i in range(40):
    c = ctrl0 + 0.1 * jnp.asarray(rng.normal(size=sys_r.nu), jnp.float32)
    states.append(st)
    ctrls.append(c)
    st = pipeline.step(sys30, st, c, 1)

worst, werr = None, -1.0
f8 = jax.jit(lambda s, c: pipeline.forward(sys8, s, c).sol.qacc)
f30 = jax.jit(lambda s, c: pipeline.forward(sys30, s, c).sol.qacc)
for i, (s, c) in enumerate(zip(states, ctrls)):
    e = float(jnp.max(jnp.abs(f8(s, c) - f30(s, c))
                      / (1.0 + jnp.abs(f30(s, c)))))
    if e > werr:
        worst, werr = i, e
print(f"worst frame {worst}: rel err {werr:.3e}")

s, c = states[worst], ctrls[worst]

# assemble that frame's Newton system and iterate manually, logging cost
from nightmare_rl_tpu.physics import arrow, collision, dynamics, kinematics
from nightmare_rl_tpu.ops import linalg

kin = kinematics.kinematics(sys_r, s.qpos)
vel = kinematics.com_vel(sys_r, kin, s.qvel)
M = dynamics.crb(sys_r, kin)
bias = dynamics.rne_bias(sys_r, kin, vel, s.qvel)
act = dynamics.actuation(sys_r, s.qpos, s.qvel, c)
qfrc_smooth = act.qfrc_actuator + dynamics.passive(sys_r, s.qvel) - bias
lay = arrow.layout(sys_r)
fac = arrow.factor(lay, M)
qacc_smooth = arrow.solve_vec(lay, fac, qfrc_smooth)
con = collision.find_contacts(sys_r, kin)
asm = solver.assemble(sys_r, con, s.qpos, s.qvel, pair=None, lay=lay)
nefc = asm.nefc
print("nefc rows:", nefc.J.shape, "active quad:",
      int(jnp.sum(nefc.quad_active)),
      "cones:", [(g.dim, int(jnp.sum(g.active))) for g in nefc.cones])


def cost(x):
    dx = x - qacc_smooth
    return float(0.5 * dx @ (M @ dx)
                 + newton.constraint_cost(nefc, nefc.J @ x - nefc.aref))


x = qacc_smooth
for it in range(16):
    out = newton.solve(nefc, M, qacc_smooth, 1, 8, x0=x)
    x_new = out.qacc
    print(f"iter {it:2d}: cost {cost(x):.9e} -> {cost(x_new):.9e}  "
          f"step {float(jnp.max(jnp.abs(x_new - x))):.3e}")
    x = x_new
ref = newton.solve(nefc, M, qacc_smooth, 60, 8)
print("cost at 60-iter solve:", f"{cost(ref.qacc):.9e}")
print("err of manual chain vs 60-iter:",
      float(jnp.max(jnp.abs(x - ref.qacc) / (1.0 + jnp.abs(ref.qacc)))))
