"""Raw physics throughput micro-benchmark.

Equivalent of the reference's simple_test.py (threaded mj_step throughput,
simple_test.py:8-47) for the batched TPU pipeline: N lockstep envs, zero
control, prints physics substeps/s.

    python -m nightmare_rl_tpu.tools.simple_test -e 4096 -s 10 -d 4
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--decimation", type=int, default=4)
    p.add_argument("-e", "--env_num", type=int, default=2048)
    p.add_argument("-s", "--num_steps", type=int, default=10)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from nightmare_rl_tpu.physics import loader, pipeline
    from nightmare_rl_tpu.physics import system as S

    sys = S.tree_cast(loader.load_system("nightmare_v3"), jnp.float32)
    sys = dataclasses.replace(sys, max_contacts=16)
    N = args.env_num
    st = jax.vmap(lambda _: pipeline.make_state(sys))(jnp.arange(N))
    ctrl = jnp.zeros((N, sys.nu), jnp.float32)

    @jax.jit
    def run(st):
        out = jax.vmap(
            lambda s: pipeline.step(sys, s, ctrl[0], args.decimation)
        )(st)
        return out, out.qpos.sum()

    st, s = run(st)
    float(s)  # compile + honest sync (block_until_ready lies on axon)
    t0 = time.time()
    for _ in range(args.num_steps):
        st, s = run(st)
    float(s)
    wall = time.time() - t0
    print(N * args.num_steps * args.decimation / wall, "steps per second")


if __name__ == "__main__":
    main()
