"""Data-parallel training over a device mesh (virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.core.config import (
    EnvCfg, NightmareV3Cfg, PPOCfg, RunnerCfg,
)
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.parallel.mesh import ShardedPPO, make_mesh


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >1 device")
def test_sharded_learn_step():
    mesh = make_mesh(jax.devices()[:2])
    env = NightmareV3Env(NightmareV3Cfg().replace(env=EnvCfg(num_envs=4)))
    cfg = PPOCfg().replace(runner=RunnerCfg(num_steps_per_env=2))
    trainer = ShardedPPO(env, cfg, mesh)
    ts = trainer.init(0)
    ts, stats = trainer.learn_step(ts)
    assert np.isfinite(float(stats["loss"]))
    assert int(ts.iteration.addressable_data(0)) == 1 if hasattr(
        ts.iteration, "addressable_data") else True
    # params replicated: every device shard identical
    p0 = jax.tree_util.tree_leaves(ts.params)[0]
    shards = [np.asarray(s.data) for s in p0.addressable_shards]
    np.testing.assert_array_equal(shards[0], shards[-1])
    # second step continues
    ts, stats2 = trainer.learn_step(ts)
    assert np.isfinite(float(stats2["loss"]))