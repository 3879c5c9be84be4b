"""nightmare_v3 env semantics: obs layout, reward formulas, termination and
command rules checked against hand-computed reference formulas
(envs/nightmare_v3_env.py:291-309, 399-497, 239-256)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg
from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env


@pytest.fixture(scope="module")
def env():
    return NightmareV3Env(NightmareV3Cfg().replace(env=EnvCfg(num_envs=4)))


@pytest.fixture(scope="module")
def stepped(env):
    state, obs = env.reset(0)
    rng = np.random.default_rng(3)
    acts = jnp.array(rng.normal(size=(4, 18)) * 0.5, jnp.float32)
    out = env.step(state, acts)
    return env, out, acts


def test_obs_layout(stepped):
    env, out, acts = stepped
    obs = np.asarray(out.obs)
    s = out.state
    assert obs.shape == (4, 66)
    # blocks: [lin_vel*2 | ang_vel*0.25 | gravity | cmd*scale |
    #          (q - default)*1 | qd*0.05 | actions]
    np.testing.assert_allclose(
        obs[:, 9:12],
        np.asarray(s.commands) * np.array([2.0, 2.0, 0.25]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        obs[:, 12:30],
        np.asarray(s.dof_pos) - np.asarray(env.default_dof_pos),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        obs[:, 30:48], np.asarray(s.dof_vel) * 0.05, atol=1e-6
    )
    # trailing block = the clipped, scaled actions the env applied
    np.testing.assert_allclose(
        obs[:, 48:66],
        np.clip(np.asarray(acts) * 0.2, -1.0, 1.0),
        atol=1e-6,
    )
    # projected gravity is the unnormalized 9.81 vector (reference quirk)
    g_norm = np.linalg.norm(obs[:, 6:9], axis=1)
    np.testing.assert_allclose(g_norm, 9.81, atol=1e-3)


def test_reward_terms_match_formulas(stepped):
    env, out, acts = stepped
    s = out.state
    dt = env.dt
    terms = dict(zip(env.active_rewards, np.asarray(out.reward_terms).T))
    lin_vel = None  # recomputed below from obs scaling
    obs = np.asarray(out.obs)
    lin_vel = obs[:, 0:3] / 2.0
    ang_vel = obs[:, 3:6] / 0.25
    cmd = np.asarray(s.commands)
    exp_track_lin = 8.0 * dt * np.exp(
        -np.sum((cmd[:, :2] - lin_vel[:, :2]) ** 2, axis=1) / 0.008
    )
    np.testing.assert_allclose(
        terms["tracking_lin_vel"], exp_track_lin, rtol=2e-3, atol=1e-9
    )
    exp_track_ang = 6.0 * dt * np.exp(
        -((cmd[:, 2] - ang_vel[:, 2]) ** 2) / 0.008
    )
    np.testing.assert_allclose(
        terms["tracking_ang_vel"], exp_track_ang, rtol=2e-3, atol=1e-9
    )
    grav = obs[:, 6:9]
    np.testing.assert_allclose(
        terms["orientation"],
        -5.0 * dt * (grav[:, 0] ** 2 + grav[:, 1] ** 2),
        rtol=2e-3,
    )
    dof_pos_err = obs[:, 12:30]
    np.testing.assert_allclose(
        terms["default_position"],
        -0.01 * dt * np.sum(dof_pos_err**2, axis=1),
        rtol=2e-3,
    )
    # total = sum of terms
    np.testing.assert_allclose(
        np.asarray(out.reward), np.asarray(out.reward_terms).sum(1), atol=1e-5
    )


def test_commands_have_zero_vy(env):
    state, _ = env.reset(1)
    cmd = np.asarray(state.commands)
    assert (cmd[:, 1] == 0).all()          # vy forced to 0 (:329)
    assert (np.abs(cmd[:, 0]) <= 0.5).all()
    assert (np.abs(cmd[:, 2]) <= 0.8).all()


def test_timeout_termination(env):
    state, _ = env.reset(2)
    state = state.replace(
        episode_length=jnp.full(4, env.max_episode_length, jnp.int32)
    )
    out = env.step(state, jnp.zeros((4, 18), jnp.float32))
    assert np.asarray(out.done).all()
    assert np.asarray(out.time_out).all()
    # reset envs got fresh physics state and zeroed episode length
    assert (np.asarray(out.state.episode_length) == 0).all()
    np.testing.assert_allclose(
        np.asarray(out.state.phys.qpos[:, 2]), 0.15, atol=1e-6
    )
