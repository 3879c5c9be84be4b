"""PPO smoke tests: feedforward and recurrent policies learn-step correctly,
checkpoints roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.core.config import (
    EnvCfg, NightmareV3Cfg, PPOCfg, PolicyCfg, RunnerCfg,
)
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.rl.ppo import PPO


@pytest.fixture(scope="module")
def env():
    return NightmareV3Env(NightmareV3Cfg().replace(env=EnvCfg(num_envs=8)))


def _short_runner(**kw):
    return RunnerCfg(num_steps_per_env=8, **kw)


def test_feedforward_learn_step(env):
    ppo = PPO(env, PPOCfg().replace(runner=_short_runner()))
    ts = ppo.init(0)
    ts, stats = ppo.learn_step(ts)
    assert np.isfinite(float(stats["loss"]))
    assert int(ts.iteration) == 1
    # adaptive lr moved off its initial value or stayed within bounds
    # (float32 max(1e-5, ·) can land epsilon below the bound)
    assert 0.99e-5 <= float(stats["lr"]) <= 1.01e-2


def test_recurrent_learn_step(env):
    cfg = PPOCfg().replace(
        runner=_short_runner(policy_class_name="ActorCriticRecurrent"),
        policy=PolicyCfg(rnn_hidden_size=32),
    )
    ppo = PPO(env, cfg)
    assert ppo.recurrent
    ts = ppo.init(0)
    ts, stats = ppo.learn_step(ts)
    assert np.isfinite(float(stats["loss"]))
    # hidden state is carried and nonzero after a rollout
    h = jax.tree_util.tree_leaves(ts.hidden)[0]
    assert float(jnp.abs(h).max()) > 0


def test_checkpoint_roundtrip(env, tmp_path):
    from nightmare_rl_tpu.utils import checkpoint as ckpt

    ppo = PPO(env, PPOCfg().replace(runner=_short_runner()))
    ts = ppo.init(0)
    ts, _ = ppo.learn_step(ts)
    path = str(tmp_path / "model_1")
    ckpt.save(path, ts)
    ts2 = ckpt.restore(path, ppo.init(1))
    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ts2.iteration) == 1
    # restored state continues training
    ts3, stats = ppo.learn_step(ts2)
    assert np.isfinite(float(stats["loss"]))
