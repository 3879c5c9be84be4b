"""Two-process jax.distributed smoke of the sharded trainer.

Run by tests/test_multihost.py: each process owns half the virtual CPU
devices of one global 8-device ('data',) mesh and contributes only its own
TrainState shards (parallel/mesh.ShardedPPO._place).  One full sharded PPO
iteration runs across the process boundary; every process prints the
(replicated) loss, which the harness asserts finite and equal.

    python scripts/multihost_smoke.py <process_id> <num_processes> <port>

This is the real --multihost code path of tools/train.py (jax.distributed +
make_array_from_callback placement), exercised without a TPU pod — the
reference has no distributed story at all (SURVEY §2.4).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    ndev_local = 4
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev_local}"
    )

    # cross-process CPU collectives (the ICI stand-in on this box)
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

    import jax

    # the image's axon TPU plugin ignores JAX_PLATFORMS (sitecustomize); the
    # platform must be forced through jax.config (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        local_device_ids=list(range(ndev_local)),
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * ndev_local
    assert len(jax.local_devices()) == ndev_local

    from nightmare_rl_tpu.core.config import (
        AlgorithmCfg, EnvCfg, NightmareV3Cfg, PPOCfg, RunnerCfg,
    )
    from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
    from nightmare_rl_tpu.parallel.mesh import ShardedPPO, make_mesh

    env = NightmareV3Env(NightmareV3Cfg().replace(env=EnvCfg(num_envs=16)))
    cfg = PPOCfg().replace(
        runner=RunnerCfg(num_steps_per_env=4),
        algorithm=AlgorithmCfg(num_mini_batches=1, num_learning_epochs=1),
    )
    trainer = ShardedPPO(env, cfg, make_mesh(jax.devices()))
    ts = trainer.init(0)

    # every process holds only its local shards of the env state
    q = ts.env_state.phys.qpos
    assert len(q.addressable_shards) == ndev_local, len(q.addressable_shards)
    assert q.sharding.shard_shape(q.shape)[0] == 16 // (nproc * ndev_local)

    ts, stats = trainer.learn_step(ts)
    loss = float(stats["loss"])  # stats replicated -> fetchable everywhere
    kl = float(stats["kl"])
    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f} kl={kl:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
