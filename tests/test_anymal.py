"""anymal_c morphology: physics sanity + env smoke (BASELINE config 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.physics import loader, pipeline


@pytest.fixture(scope="module")
def sys():
    return loader.load_system("anymal_c")


pytestmark = pytest.mark.slow

def test_stands_under_position_hold(sys):
    st = pipeline.make_state(sys)
    ctrl = jnp.array(st.qpos[7:])
    st = pipeline.step(sys, st, ctrl, 300)
    assert 0.4 < float(st.qpos[2]) < 0.7          # standing, not collapsed
    up = 1.0 - 2.0 * (st.qpos[4] ** 2 + st.qpos[5] ** 2)  # R_zz from quat
    assert float(up) > 0.9                        # upright
    # all four feet loaded (synthetic touch sensors)
    forces = np.asarray(st.sensordata)
    assert forces.shape == (4,)
    assert (forces > 5.0).all()
    total = forces.sum()
    weight = float(np.asarray(sys.body_mass).sum()) * 9.81
    assert 0.6 * weight < total < 1.4 * weight


def test_joint_limits_hold(sys):
    """Command far beyond the joint range; limits must clamp motion."""
    st = pipeline.make_state(sys)
    lo = np.asarray(sys.jnt_range)[1:, 0]
    hi = np.asarray(sys.jnt_range)[1:, 1]
    ctrl = jnp.array(hi + 3.0)  # push every joint above its upper limit
    st = pipeline.step(sys, st, ctrl, 400)
    q = np.asarray(st.qpos[7:])
    assert (q < hi + 0.15).all(), q - hi


def test_env_smoke():
    from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv

    env = AnymalCEnv(AnymalCCfg(num_envs=4))
    state, obs = env.reset(0)
    assert obs.shape == (4, 48)
    rng = np.random.default_rng(0)
    for _ in range(3):
        out = env.step(state, jnp.array(rng.normal(size=(4, 12)) * 0.2,
                                        jnp.float32))
        state = out.state
    assert np.isfinite(np.asarray(out.reward)).all()
    assert not np.asarray(out.done).any()  # shouldn't fall in 3 steps


def test_env_per_term_metrics():
    """Flagship-fidelity contract: per-term reward metrics + feet-air-time
    machinery driven by the synthesized foot touch sensors (VERDICT r2
    weak #6)."""
    import jax

    from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv

    env = AnymalCEnv(AnymalCCfg(num_envs=2))
    # every named scale that is nonzero appears, in order
    assert "tracking_lin_vel" in env.active_rewards
    assert "feet_air_time" in env.active_rewards
    assert "torques" in env.active_rewards
    n = len(env.active_rewards)
    state, obs = env.reset(0)
    out = env.step(state, jnp.zeros((2, 12), jnp.float32))
    assert out.reward_terms.shape == (2, n)
    assert out.finished_episode_sums.shape == (2, n)
    # standing still at default pose: tracking terms positive, termination 0
    terms = np.asarray(out.reward_terms)
    idx = {k: i for i, k in enumerate(env.active_rewards)}
    assert (terms[:, idx["tracking_lin_vel"]] >= 0).all()
    assert (terms[:, idx["termination"]] == 0).all()
    # torque penalty engages (position servos hold the legs up)
    assert (terms[:, idx["torques"]] < 0).all()
    # feet in contact from the start: air-time accumulator stays zero
    assert np.asarray(out.state.feet_air_time).max() == 0.0
    assert np.asarray(out.state.last_contacts).all()


def test_env_trains_one_iteration():
    """The env satisfies the PPO runner contract end to end."""
    from nightmare_rl_tpu.core.config import PPOCfg, RunnerCfg
    from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv
    from nightmare_rl_tpu.rl.ppo import PPO

    env = AnymalCEnv(AnymalCCfg(num_envs=4))
    ppo = PPO(env, PPOCfg().replace(runner=RunnerCfg(num_steps_per_env=4)))
    ts = ppo.init(0)
    ts, stats = ppo.learn_step(ts)
    assert np.isfinite(float(stats["loss"]))
    assert stats["episode_reward_means"].shape == (len(env.active_rewards),)


def test_state_validity_autoreset():
    """mj_checkPos/mj_checkVel parity (pipeline.py): a step from a
    non-finite or >mjMAXVAL state resets that env to the reference pose
    with zero velocity instead of propagating NaNs forever."""
    import jax.numpy as jnp

    s = loader.load_system("anymal_c")
    st = pipeline.make_state(s)
    st = st.replace(qpos=jnp.asarray(st.qpos),
                    qvel=jnp.full(s.nv, 1e12, st.qvel.dtype))
    st = pipeline.step(s, st, jnp.array(st.qpos[7:]), 1)
    assert bool(jnp.all(jnp.isfinite(st.qpos)))
    assert bool(jnp.all(jnp.isfinite(st.qvel)))
    assert float(jnp.max(jnp.abs(st.qvel))) < 1e3
    np.testing.assert_allclose(np.asarray(st.qpos[:7]),
                               np.asarray(s.qpos0[:7]), atol=1e-3)
