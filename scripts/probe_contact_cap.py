"""Full-scale max_contacts activity probe (VERDICT r3 weak #4).

Drives the bench workload (random actions, 2048 envs by default) and
records, per env step, how many condim-3 candidates actually penetrate and
how deep the first candidate beyond the top-K cut sits.  If the (K+1)-th
deepest candidate ever penetrates, the static top-K selection is silently
changing contact forces vs MuJoCo's dynamic instantiation.

    python scripts/probe_contact_cap.py [--envs 2048] [--steps 200]

Prints an activity histogram + the worst-case margin.  Run on the TPU for
the full batch; the fast-subset test (tests/test_contact_cap.py) is the
small CPU version.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.physics import collision, kinematics


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=2048)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    env = NightmareV3Env(
        NightmareV3Cfg().replace(env=EnvCfg(num_envs=args.envs))
    )
    sys_ = env.sys
    K = sys_.max_contacts

    def stats(qpos):
        kin = kinematics.kinematics(sys_, qpos)
        con = collision.find_contacts(sys_, kin)
        n_pen = jnp.sum(con.dist < 0.0)
        return n_pen, jnp.sort(con.dist)[K]

    stats_b = jax.jit(jax.vmap(stats))

    rng = jax.random.PRNGKey(0)
    state, _ = env.reset(0)
    hist = np.zeros(sys_.ncp + 1, np.int64)
    worst17 = np.inf
    for k in range(args.steps):
        rng, kk = jax.random.split(rng)
        actions = jax.random.normal(kk, (args.envs, env.num_actions))
        out = env._step_batch(state, actions)
        state = out.state
        n_pen, d17 = stats_b(state.phys.qpos)
        n_pen = np.asarray(n_pen)
        hist += np.bincount(n_pen, minlength=sys_.ncp + 1)
        worst17 = min(worst17, float(d17.min()))

    total = hist.sum()
    print(f"envs={args.envs} steps={args.steps} K={K} "
          f"candidates={sys_.ncp}")
    print("active-contact histogram (n_penetrating: share of env-steps):")
    for n, c in enumerate(hist):
        if c:
            print(f"  {n:3d}: {c / total:7.4%}  ({c})")
    print(f"max simultaneous penetrating candidates: "
          f"{np.flatnonzero(hist).max()}")
    print(f"worst {K + 1}-th-deepest dist: {worst17:+.3e} m "
          f"({'OK — cap never bites' if worst17 > 0 else 'CAP VIOLATED'})")


if __name__ == "__main__":
    main()
