"""PPO driven by a host-stepped external environment.

The flagship trainer (rl/ppo.py) fuses the env into the jitted iteration;
this driver replaces only the rollout's env call with a host callback while
reusing PPO's policy, GAE, and minibatch update verbatim — same timeout
bootstrapping, same per-env PRNG key structure, same adaptive-KL schedule.

Purpose: cross-validation of the learning-curve criterion (BASELINE.md
"PPO learning curve within seed variance of reference train.py").  rsl_rl
is not installable in this container, but the reference ENVIRONMENT runs
fine on CPU (mujoco + torch-cpu) — so tools/compare_reference_curve.py
trains our PPO once against the reference env (imported from
/root/reference, not copied) and once against our env through this same
driver, and overlays the per-term curves.  Env parity x PPO-semantics
parity (tests/test_ppo.py) then discharges the criterion transitively.

It is also a real framework capability: any VecEnv-shaped simulator
(host-side, hardware-in-the-loop, ...) can train against the TPU learner
this way, at the cost of a host<->device round trip per control step.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.core.config import PPOCfg
from nightmare_rl_tpu.models import actor_critic as ac
from nightmare_rl_tpu.rl.ppo import PPO, TrainState, Transition


class _EnvShim:
    """The only attribute PPO.__init__ reads from its env."""

    def __init__(self, num_actions: int):
        self.num_actions = num_actions


class ExternalPPO:
    """PPO whose rollout steps an external env via a host callback.

    env_step_fn(actions: np.ndarray (N, A)) ->
        (obs (N, O), reward (N,), done (N,), time_out (N,)) as numpy.
    """

    def __init__(self, num_obs: int, num_actions: int, num_envs: int,
                 cfg: PPOCfg):
        assert cfg.runner.policy_class_name == "ActorCritic", (
            "external driver supports the feedforward policy"
        )
        self.ppo = PPO(_EnvShim(num_actions), cfg)
        self.cfg = cfg
        self.num_envs = num_envs
        self.num_obs = num_obs

        def policy_step(params, obs, rng):
            ks = jax.vmap(jax.random.split)(rng)      # (N, 2, 2)
            rng, k = ks[:, 0], ks[:, 1]
            mu, std, value = self.ppo.net.apply(params, obs)
            action = jax.vmap(ac.sample_action)(k, mu, std)
            logp = ac.log_prob(mu, std, action)
            return rng, action, mu, std, value, logp

        def update(ts, traj, last_value):
            _, returns, norm_adv = self.ppo._gae(traj, last_value)
            params, opt_state, lr, rng, stats = self.ppo._update(
                ts, traj, returns, norm_adv, ts.rng
            )
            new_ts = ts.replace(
                params=params, opt_state=opt_state, lr=lr, rng=rng,
                iteration=ts.iteration + 1,
            )
            return new_ts, stats

        self._policy_step = jax.jit(policy_step)
        self._update = jax.jit(update)
        self._last_value = jax.jit(
            lambda params, obs: self.ppo.net.apply(params, obs)[2]
        )

    def init(self, seed: int, obs0: np.ndarray) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        rng, k_net = jax.random.split(rng)
        obs0 = jnp.asarray(obs0, jnp.float32)
        params = self.ppo.net.init(k_net, obs0[:1])
        return TrainState(
            params=params,
            opt_state=self.ppo.tx.init(params),
            lr=jnp.asarray(self.cfg.algorithm.learning_rate, jnp.float32),
            rng=jax.random.split(rng, self.num_envs),
            env_state=(),                     # lives on the host side
            obs=obs0,
            iteration=jnp.zeros((), jnp.int32),
        )

    def learn_iteration(
        self, ts: TrainState,
        env_step_fn: Callable[[np.ndarray], Tuple[np.ndarray, ...]],
    ) -> Tuple[TrainState, dict]:
        T = self.cfg.runner.num_steps_per_env
        gamma = self.cfg.algorithm.gamma
        obs, rng = ts.obs, ts.rng
        rows = []
        reward_sum = 0.0
        dones_sum = 0
        for _ in range(T):
            rng, action, mu, std, value, logp = self._policy_step(
                ts.params, obs, rng
            )
            obs_next, reward, done, time_out = env_step_fn(np.asarray(action))
            # timeout bootstrap exactly as the fused rollout (rl/ppo.py)
            reward_b = (
                jnp.asarray(reward, jnp.float32)
                + gamma * value * jnp.asarray(time_out, jnp.float32)
            )
            rows.append(Transition(
                obs, action, reward_b,
                jnp.asarray(done, bool), value, logp, mu, std,
            ))
            reward_sum += float(np.mean(reward))
            dones_sum += int(np.sum(np.asarray(done) != 0))
            obs = jnp.asarray(obs_next, jnp.float32)
        traj = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *rows
        )
        last_value = self._last_value(ts.params, obs)
        ts = ts.replace(obs=obs, rng=rng)
        ts, stats = self._update(ts, traj, last_value)
        stats = dict(
            stats,
            mean_reward=reward_sum / T,      # pre-bootstrap, host-computed
            dones=dones_sum,
            mean_noise_std=float(
                jnp.abs(ts.params["params"]["std"]).mean()
            ),
        )
        return ts, stats
