"""On-device PPO: fused rollout + GAE + clipped update, one jit per iteration.

TPU-native replacement for rsl_rl v1.0.2's OnPolicyRunner/PPO (the external
layer the reference drives from train.py:40-54).  Semantics mirrored:

- 80-step rollout per iteration (runner.num_steps_per_env), storage of
  (obs, action, reward, done, value, logp, mu, sigma);
- timeout bootstrapping: reward += γ·V(s)·timeout (PPO.process_env_step,
  enabled by extras['time_outs'] — envs/nightmare_v3_env.py:369-371);
- GAE(γ=0.99, λ=0.95), advantages normalized over the whole batch;
- 5 epochs × 4 minibatches over one shared random permutation;
- clipped surrogate (0.2) + clipped value loss + entropy bonus (0.0015);
- adaptive learning rate targeting desired_kl=0.01, updated per minibatch
  (×1.5 / ÷1.5, clamped to [1e-5, 1e-2]) and applied immediately;
- Adam with grad-norm clip 1.0.

The whole iteration — env scan + update epochs — compiles to a single XLA
program; nothing touches the host in the hot loop.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from nightmare_rl_tpu.core.config import PPOCfg
from nightmare_rl_tpu.models import actor_critic as ac


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    lr: jnp.ndarray          # () adaptive learning rate
    rng: jnp.ndarray         # (N, 2) one PRNG key PER ENV — action noise is
    #                          then independent of how envs are sharded, so
    #                          1-device and N-device rollouts are bit-identical
    env_state: Any           # batched EnvState
    obs: jnp.ndarray         # (N, num_obs) current observations
    iteration: jnp.ndarray   # () int32
    hidden: Any = ()         # recurrent policy carry ((cA,hA),(cC,hC)) or ()


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    value: jnp.ndarray
    logp: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray


class PPO:
    def __init__(self, env, cfg: PPOCfg, dtype=jnp.float32, axis_name=None,
                 num_shards: int = 1, record_states: bool = False):
        """axis_name: when run under shard_map over a device mesh axis, the
        name of that axis — gradients, KL, and advantage statistics are then
        pmean'd across it so every shard takes identical optimizer steps.

        record_states: collect env 0's per-step (qpos, qvel, action, done)
        into stats['record'] each iteration, for the training-time trajectory
        recorder (reference envs/nightmare_v3_env.py:261-272).  Unsharded
        runner only — ShardedPPO keeps it off (env 0 lives on one shard)."""
        self.env = env
        self.cfg = cfg
        self.dtype = dtype
        self.axis_name = axis_name
        self.num_shards = num_shards
        self.record_states = record_states and axis_name is None
        p = cfg.policy
        self.recurrent = cfg.runner.policy_class_name == "ActorCriticRecurrent"
        if self.recurrent:
            assert p.rnn_num_layers == 1, "single-layer LSTM supported"
            self.net = ac.ActorCriticRecurrent(
                num_actions=env.num_actions,
                actor_hidden=tuple(p.actor_hidden_dims),
                critic_hidden=tuple(p.critic_hidden_dims),
                activation=p.activation,
                init_noise_std=p.init_noise_std,
                rnn_hidden=p.rnn_hidden_size,
                std_floor=p.std_floor,
            )
        else:
            self.net = ac.ActorCritic(
                num_actions=env.num_actions,
                actor_hidden=tuple(p.actor_hidden_dims),
                critic_hidden=tuple(p.critic_hidden_dims),
                activation=p.activation,
                init_noise_std=p.init_noise_std,
                std_floor=p.std_floor,
            )
        a = cfg.algorithm
        self.tx = optax.chain(
            optax.clip_by_global_norm(a.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=a.learning_rate),
        )
        self._iterate = jax.jit(self._iteration)

    # ------------------------------------------------------------------

    def init(self, seed: int | None = None) -> TrainState:
        seed = self.cfg.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        rng, k_env, k_net = jax.random.split(rng, 3)
        env_state, obs = self.env.reset(seed)
        if self.recurrent:
            hidden = self.net.initial_state(self.env.num_envs, self.dtype)
            params = self.net.init(k_net, obs, hidden)
        else:
            hidden = ()
            params = self.net.init(k_net, obs[:1])
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            lr=jnp.asarray(self.cfg.algorithm.learning_rate, self.dtype),
            rng=jax.random.split(rng, self.env.num_envs),  # per-env keys
            env_state=env_state,
            obs=obs,
            iteration=jnp.zeros((), jnp.int32),
            hidden=hidden,
        )

    def randomize_episode_lengths(self, ts: TrainState) -> TrainState:
        """init_at_random_ep_len=True (train.py:54): spread initial episode
        lengths uniformly so resets decorrelate.  Derived per-env (fold_in)
        so the result is independent of sharding."""
        lens = jax.vmap(
            lambda k: jax.random.randint(
                jax.random.fold_in(k, 17), (), 0,
                self.env.max_episode_length, jnp.int32,
            )
        )(ts.rng)
        env_state = ts.env_state.replace(episode_length=lens)
        return ts.replace(env_state=env_state)

    # ------------------------------------------------------------------

    def _policy(self, params, obs):
        return self.net.apply(params, obs)

    def _rollout(self, ts: TrainState):
        T = self.cfg.runner.num_steps_per_env
        gamma = self.cfg.algorithm.gamma

        def step(carry, _):
            env_state, obs, rng, hidden = carry
            # advance each env's own key: action noise is a function of the
            # env, not of the shard layout
            ks = jax.vmap(jax.random.split)(rng)   # (N, 2, 2)
            rng, k = ks[:, 0], ks[:, 1]
            if self.recurrent:
                (mu, std, value), hidden = self.net.apply(
                    ts.params, obs, hidden
                )
            else:
                mu, std, value = self._policy(ts.params, obs)
            action = jax.vmap(ac.sample_action)(k, mu, std)
            logp = ac.log_prob(mu, std, action)
            out = self.env.step(env_state, action)
            if self.recurrent:
                hidden = ac.reset_hidden(hidden, out.done)
            # timeout bootstrap (rsl_rl PPO.process_env_step)
            reward = out.reward + gamma * value * out.time_out.astype(value.dtype)
            tr = Transition(obs, action, reward, out.done, value, logp, mu, std)
            metrics = (out.reward_terms, out.finished_episode_sums, out.done)
            if self.record_states:
                # env 0's pre-reset state this step; XLA keeps only row 0
                rec = (out.record_qpos[0], out.record_qvel[0],
                       action[0], out.done[0], out.state.commands[0])
            else:
                rec = ()
            return (out.state, out.obs, rng, hidden), (tr, metrics, rec)

        (env_state, obs, rng, hidden), (traj, metrics, rec) = jax.lax.scan(
            step, (ts.env_state, ts.obs, ts.rng, ts.hidden), None, length=T
        )
        return env_state, obs, rng, hidden, traj, metrics, rec

    def _gae(self, traj: Transition, last_value):
        a = self.cfg.algorithm

        def scan_fn(adv_next, tr_and_next_value):
            tr, next_value = tr_and_next_value
            nonterminal = 1.0 - tr.done.astype(tr.value.dtype)
            delta = tr.reward + a.gamma * next_value * nonterminal - tr.value
            adv = delta + a.gamma * a.lam * nonterminal * adv_next
            return adv, adv

        next_values = jnp.concatenate(
            [traj.value[1:], last_value[None]], axis=0
        )
        _, advantages = jax.lax.scan(
            scan_fn, jnp.zeros_like(last_value), (traj, next_values), reverse=True
        )
        returns = advantages + traj.value
        # global batch statistics (ddof=1 to match torch .std()); reduced
        # across the data axis when sharded
        n_global = advantages.size * self.num_shards
        mean = self._pmean(advantages.mean())
        var = self._psum(jnp.square(advantages - mean).sum()) / max(n_global - 1, 1)
        norm_adv = (advantages - mean) / (jnp.sqrt(var) + 1e-8)
        return advantages, returns, norm_adv

    def _pmean(self, x):
        if self.axis_name is None:
            return x
        return jax.lax.pmean(x, self.axis_name)

    def _psum(self, x):
        if self.axis_name is None:
            return x
        return jax.lax.psum(x, self.axis_name)

    def _loss_terms(self, a, mb, mb_ret, mb_adv, mu, std, value):
        """Clipped PPO losses given fresh policy outputs (any shape, flattened
        consistently with the stored minibatch)."""
        logp = ac.log_prob(mu, std, mb.action)
        ratio = jnp.exp(logp - mb.logp)
        surr1 = -mb_adv * ratio
        surr2 = -mb_adv * jnp.clip(ratio, 1.0 - a.clip_param, 1.0 + a.clip_param)
        surrogate = jnp.maximum(surr1, surr2).mean()
        if a.use_clipped_value_loss:
            v_clip = mb.value + jnp.clip(
                value - mb.value, -a.clip_param, a.clip_param
            )
            v_loss = jnp.maximum(
                jnp.square(value - mb_ret), jnp.square(v_clip - mb_ret)
            ).mean()
        else:
            v_loss = jnp.square(value - mb_ret).mean()
        ent = ac.entropy(std).mean()
        loss = surrogate + a.value_loss_coef * v_loss - a.entropy_coef * ent
        kl = ac.gaussian_kl(mb.mu, mb.sigma, mu, std).mean()
        return loss, surrogate, v_loss, kl

    def _adapt_lr(self, a, lr, kl):
        if a.schedule != "adaptive":
            return lr
        return jnp.where(
            kl > a.desired_kl * 2.0,
            jnp.maximum(1e-5, lr / 1.5),
            jnp.where(
                (kl < a.desired_kl / 2.0) & (kl > 0.0),
                jnp.minimum(1e-2, lr * 1.5),
                lr,
            ),
        )

    def _update_recurrent(self, ts: TrainState, traj, returns, norm_adv, rng):
        """Recurrent PPO update: minibatches are groups of whole-env
        trajectories, replayed through the LSTM from the rollout-start hidden
        state with done-masked resets (rsl_rl's recurrent generator keeps
        trajectories intact the same way)."""
        a = self.cfg.algorithm
        T, N = traj.reward.shape
        nmb = a.num_mini_batches
        # shard-local permutation, derived without consuming the per-env
        # stream (rng[0] advances every rollout step, so this varies per iter)
        k = jax.random.fold_in(rng[0], 23)
        perm = jax.random.permutation(k, N).reshape(nmb, N // nmb)
        idxs = jnp.tile(perm, (a.num_learning_epochs, 1))

        def minibatch_step(carry, env_idx):
            params, opt_state, lr = carry
            mb = jax.tree_util.tree_map(lambda x: x[:, env_idx], traj)
            mb_ret = returns[:, env_idx]
            mb_adv = norm_adv[:, env_idx]
            h0 = jax.tree_util.tree_map(lambda h: h[env_idx], ts.hidden)

            def loss_fn(p):
                def scan_step(hidden, xs):
                    obs_t, done_t = xs
                    (mu, std, v), hidden = self.net.apply(p, obs_t, hidden)
                    hidden = ac.reset_hidden(hidden, done_t)
                    return hidden, (mu, std, v)

                _, (mu, std, value) = jax.lax.scan(
                    scan_step, h0, (mb.obs, mb.done)
                )
                loss, surr, v_loss, kl = self._loss_terms(
                    a, mb, mb_ret, mb_adv, mu, std, value
                )
                return loss, (surr, v_loss, kl)

            (loss, (surr, v_loss, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            grads = jax.tree_util.tree_map(self._pmean, grads)
            kl = self._pmean(kl)
            lr = self._adapt_lr(a, lr, kl)
            opt_state[1].hyperparams["learning_rate"] = lr
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_opt_state, lr), (loss, surr, v_loss, kl)

        (params, opt_state, lr), (losses, surrs, v_losses, kls) = jax.lax.scan(
            minibatch_step, (ts.params, ts.opt_state, ts.lr), idxs
        )
        stats = {
            "loss": self._pmean(losses.mean()),
            "surrogate_loss": self._pmean(surrs.mean()),
            "value_loss": self._pmean(v_losses.mean()),
            "kl": kls.mean(),
            "lr": lr,
        }
        return params, opt_state, lr, rng, stats

    def _update(self, ts: TrainState, traj: Transition, returns, norm_adv, rng):
        a = self.cfg.algorithm
        if self.recurrent:
            return self._update_recurrent(ts, traj, returns, norm_adv, rng)
        T, N = traj.reward.shape
        B = T * N
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((B,) + x.shape[2:]), traj
        )
        returns = returns.reshape(B)
        norm_adv = norm_adv.reshape(B)

        nmb = a.num_mini_batches
        mb_size = B // nmb
        k = jax.random.fold_in(rng[0], 23)
        perm = jax.random.permutation(k, B)  # one permutation, all epochs

        def minibatch_step(carry, idx):
            params, opt_state, lr = carry
            mb = jax.tree_util.tree_map(lambda x: x[idx], flat)
            mb_ret = returns[idx]
            mb_adv = norm_adv[idx]

            def loss_fn(p):
                mu, std, value = self._policy(p, mb.obs)
                loss, surr, v_loss, kl = self._loss_terms(
                    a, mb, mb_ret, mb_adv, mu, std, value
                )
                return loss, (surr, v_loss, kl)

            (loss, (surr, v_loss, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # data-parallel reduction: every shard steps identically
            grads = jax.tree_util.tree_map(self._pmean, grads)
            kl = self._pmean(kl)

            # adaptive lr (rsl_rl PPO.update): adjust from this minibatch's
            # KL, then apply the *new* lr to this minibatch's step
            lr = self._adapt_lr(a, lr, kl)
            opt_state[1].hyperparams["learning_rate"] = lr
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_opt_state, lr), (loss, surr, v_loss, kl)

        # epoch loop with the shared permutation
        idxs = perm.reshape(nmb, mb_size)
        idxs = jnp.tile(idxs, (a.num_learning_epochs, 1))
        (params, opt_state, lr), (losses, surrs, v_losses, kls) = jax.lax.scan(
            minibatch_step, (ts.params, ts.opt_state, ts.lr), idxs
        )
        stats = {
            "loss": self._pmean(losses.mean()),
            "surrogate_loss": self._pmean(surrs.mean()),
            "value_loss": self._pmean(v_losses.mean()),
            "kl": kls.mean(),  # already pmean'd per minibatch
            "lr": lr,
        }
        return params, opt_state, lr, rng, stats

    def _iteration(self, ts: TrainState):
        env_state, obs, rng, hidden, traj, (
            reward_terms, finished_sums, dones
        ), rec = self._rollout(ts)
        if self.recurrent:
            (_, _, last_value), _ = self.net.apply(ts.params, obs, hidden)
        else:
            _, _, last_value = self._policy(ts.params, obs)
        advantages, returns, norm_adv = self._gae(traj, last_value)
        params, opt_state, lr, rng, stats = self._update(
            ts, traj, returns, norm_adv, rng
        )
        new_ts = TrainState(
            params=params,
            opt_state=opt_state,
            lr=lr,
            rng=rng,
            env_state=env_state,
            obs=obs,
            iteration=ts.iteration + 1,
            hidden=hidden,
        )
        # episode metrics: mean finished-episode sums per reward term,
        # normalized by episode seconds (reference reset_idx :363-367);
        # reduced across shards when data-parallel
        n_done = self._psum(jnp.sum(~jnp.isnan(finished_sums[..., 0])))
        term_sums = self._psum(jnp.nansum(finished_sums, axis=(0, 1)))
        ep_means = jnp.where(
            n_done > 0,
            term_sums / jnp.maximum(n_done, 1) / self.env.max_episode_length_s,
            jnp.zeros(finished_sums.shape[-1]),
        )
        stats = dict(
            stats,
            mean_reward=self._pmean(traj.reward.mean()),
            dones=self._psum(dones.sum()),
            episode_reward_means=ep_means,
            # exploration health: rsl_rl's free-parameter std has no floor and
            # its collapse stalled the round-3 run (docs/BENCH_NOTES.md) —
            # surface it so the curves show collapse as it happens
            # effective value: the optional std_floor clamp (actor_critic.py)
            # applies at use time, so report what sampling actually sees
            mean_noise_std=jnp.maximum(
                jnp.abs(new_ts.params["params"]["std"]),
                self.cfg.policy.std_floor,
            ).mean(),
        )
        if self.record_states:
            # (qpos, qvel, action, done, commands), each (T, ·)
            stats["record"] = rec
        return new_ts, stats

    # ------------------------------------------------------------------

    def learn_step(self, ts: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
        """One fully-jitted PPO iteration (rollout + update)."""
        return self._iterate(ts)
