"""Debug the anymal elliptic Newton solve vs the MuJoCo oracle."""
import os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import mujoco as mj

sys.path.insert(0, "/root/repo")
from nightmare_rl_tpu.physics import loader, pipeline
from tests.test_newton import _anymal

m, d = _anymal()
sysm = loader.system_from_mjmodel(m, max_points_per_geom={"*": 4})
state = pipeline.make_state(sysm)
state = state.replace(qpos=jnp.array(d.qpos), qvel=jnp.array(d.qvel))

for iters, ls in [(sysm.solver_iterations, sysm.ls_iterations),
                  (50, 50), (200, 50)]:
    s2 = sysm.replace(solver_iterations=iters, ls_iterations=ls)
    fwd = pipeline.forward(s2, state, jnp.zeros(s2.nu))
    err = np.abs(np.asarray(fwd.sol.qacc) - d.qacc)
    rel = err / (np.abs(d.qacc) + 1e-9)
    print(f"iters={iters} ls={ls}: max abs err {err.max():.3e} "
          f"at dof {err.argmax()}, max rel {rel.max():.3e}")

fwd = pipeline.forward(sysm, state, jnp.zeros(sysm.nu))
print("n contacts ref:", d.ncon)
print("ours qacc[:6]:", np.asarray(fwd.sol.qacc)[:6])
print("ref  qacc[:6]:", d.qacc[:6])
bad = np.argsort(-np.abs(np.asarray(fwd.sol.qacc) - d.qacc))[:6]
print("worst dofs:", bad, "ours:", np.asarray(fwd.sol.qacc)[bad],
      "ref:", d.qacc[bad])
