"""Data-parallel training over the full 8-device virtual mesh.

Key invariant (rl/ppo.py TrainState.rng): action-noise keys live per-env, so
the ROLLOUT is bit-identical for any shard count.  The update differs only
through minibatch composition (each shard permutes its local envs); with
num_mini_batches=1 × 1 epoch that difference vanishes (pmean of equal-size
shard gradients == the global-batch gradient), so 1-device and 8-device
training steps must agree to float32 round-off (the nets train in f32) —
tested below.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.core.config import (
    AlgorithmCfg, EnvCfg, NightmareV3Cfg, PPOCfg, PolicyCfg, RunnerCfg,
)
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
from nightmare_rl_tpu.rl.ppo import PPO
from nightmare_rl_tpu.parallel.mesh import ShardedPPO, make_mesh

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)]


@pytest.fixture(scope="module")
def env16():
    return NightmareV3Env(NightmareV3Cfg().replace(env=EnvCfg(num_envs=16)))


def test_sharded_learn_step_8dev(env16):
    mesh = make_mesh(jax.devices()[:8])
    cfg = PPOCfg().replace(runner=RunnerCfg(num_steps_per_env=4))
    trainer = ShardedPPO(env16, cfg, mesh)
    ts = trainer.init(0)
    ts = trainer.randomize_episode_lengths(ts)
    ts, stats = trainer.learn_step(ts)
    assert np.isfinite(float(stats["loss"]))
    # params replicated: every device shard identical
    p0 = jax.tree_util.tree_leaves(ts.params)[0]
    shards = [np.asarray(s.data) for s in p0.addressable_shards]
    np.testing.assert_array_equal(shards[0], shards[-1])
    # env state sharded: each device holds 16/8 = 2 envs
    q = ts.env_state.phys.qpos
    assert q.sharding.shard_shape(q.shape)[0] == 2
    # second step continues
    ts, stats2 = trainer.learn_step(ts)
    assert np.isfinite(float(stats2["loss"]))


def test_1dev_vs_8dev_exact_when_single_minibatch(env16):
    """Same seed, num_mini_batches=1 × 1 epoch: the sharded update must equal
    the unsharded one exactly (no permutation deviation left)."""
    cfg = PPOCfg().replace(
        runner=RunnerCfg(num_steps_per_env=4),
        algorithm=AlgorithmCfg(num_mini_batches=1, num_learning_epochs=1),
    )
    ppo1 = PPO(env16, cfg)
    ts1 = ppo1.init(0)
    ts1, stats1 = ppo1.learn_step(ts1)

    trainer = ShardedPPO(env16, cfg, make_mesh(jax.devices()[:8]))
    ts8 = trainer.init(0)
    ts8, stats8 = trainer.learn_step(ts8)

    # rollout-level stats: bit-identical trajectories up to f32 reduction
    # order (local-mean-then-pmean vs one global mean)
    np.testing.assert_allclose(
        float(stats1["mean_reward"]), float(stats8["mean_reward"]), rtol=1e-6
    )
    assert int(stats1["dones"]) == int(stats8["dones"])
    # update-level: gradients were pmean'd over equal shards == global mean
    np.testing.assert_allclose(
        float(stats1["loss"]), float(stats8["loss"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        float(stats1["kl"]), float(stats8["kl"]), rtol=1e-5, atol=1e-8
    )
    # Adam's first step is ~ lr·sign(g) (second moment starts at 0), so a
    # 1-ulp f32 difference in a near-zero gradient component can move a
    # parameter by up to ~lr·ulp-amplified amounts; atol reflects that
    for a, b in zip(
        jax.tree_util.tree_leaves(ts1.params),
        jax.tree_util.tree_leaves(ts8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_1dev_vs_8dev_rollout_invariant_default_minibatching(env16):
    """With the default 5×4 minibatching the updates legitimately diverge
    (per-shard permutations — PARITY.md §4) but the rollout stats must still
    match exactly, bounding the deviation to the update step."""
    cfg = PPOCfg().replace(runner=RunnerCfg(num_steps_per_env=4))
    ppo1 = PPO(env16, cfg)
    ts1 = ppo1.init(0)
    _, stats1 = ppo1.learn_step(ts1)

    trainer = ShardedPPO(env16, cfg, make_mesh(jax.devices()[:8]))
    ts8 = trainer.init(0)
    _, stats8 = trainer.learn_step(ts8)

    np.testing.assert_allclose(
        float(stats1["mean_reward"]), float(stats8["mean_reward"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats1["episode_reward_means"]),
        np.asarray(stats8["episode_reward_means"]),
        rtol=1e-6, atol=1e-7,
    )


def test_sharded_recurrent_8dev():
    """Recurrent policy under the mesh: LSTM carries shard with the envs
    (VERDICT r2 weak #1 — the specs used to drop the hidden field)."""
    env = NightmareV3Env(NightmareV3Cfg().replace(env=EnvCfg(num_envs=32)))
    cfg = PPOCfg().replace(
        runner=RunnerCfg(
            num_steps_per_env=2, policy_class_name="ActorCriticRecurrent"
        ),
        policy=PolicyCfg(rnn_hidden_size=8),
    )
    trainer = ShardedPPO(env, cfg, make_mesh(jax.devices()[:8]))
    ts = trainer.init(0)
    assert ts.hidden != ()
    h = jax.tree_util.tree_leaves(ts.hidden)[0]
    assert h.shape == (32, 8)
    assert h.sharding.shard_shape(h.shape)[0] == 4  # sharded over envs
    ts, stats = trainer.learn_step(ts)
    assert np.isfinite(float(stats["loss"]))
    ts, stats = trainer.learn_step(ts)
    assert np.isfinite(float(stats["loss"]))


def test_runner_drives_mesh(env16, tmp_path):
    """The full-featured OnPolicyRunner (checkpoints, metrics, signals) can
    drive the sharded trainer — the train.py --mesh path."""
    from nightmare_rl_tpu.rl.runner import OnPolicyRunner

    cfg = PPOCfg().replace(runner=RunnerCfg(num_steps_per_env=2,
                                            save_interval=1))
    runner = OnPolicyRunner(env16, cfg, log_dir=str(tmp_path),
                            mesh=make_mesh(jax.devices()[:8]))
    runner.init(0)
    runner.learn(2)
    import os

    assert any(f.startswith("model_") for f in os.listdir(tmp_path))
