"""Flax actor-critic matching rsl_rl's ActorCritic module semantics.

The reference trains with rsl_rl v1.0.2's ActorCritic: MLP actor + MLP critic
(hidden dims [54, 42, 30], elu — envs/nightmare_v3_config.py:105-109) and a
state-independent learned std vector initialized at init_noise_std (the std
itself is the parameter, not log-std).  play.py:65-72,122 loads it and calls
.act(obs).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTIVATIONS = {
    "elu": nn.elu,
    "relu": nn.relu,
    "selu": nn.selu,
    "lrelu": lambda x: nn.leaky_relu(x),
    "tanh": nn.tanh,
    "sigmoid": nn.sigmoid,
}


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        for h in self.hidden:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class ActorCritic(nn.Module):
    num_actions: int
    actor_hidden: Sequence[int] = (54, 42, 30)
    critic_hidden: Sequence[int] = (54, 42, 30)
    activation: str = "elu"
    init_noise_std: float = 1.0
    # Exploration floor (flag-gated DEVIATION from rsl_rl, which has none):
    # the free-parameter std can collapse to ~0.07 in a standing local
    # optimum and strand the tracking terms (docs/BENCH_NOTES.md rounds 3-4).
    # 0.0 (default) = exact rsl_rl parity; >0 clamps the std used for
    # sampling/likelihood at this value (clamp gradient is zero below the
    # floor, so the collapse simply stops instead of needing operator
    # surgery via scripts/reset_exploration.py).
    std_floor: float = 0.0

    def setup(self):
        self.actor = MLP(self.actor_hidden, self.num_actions, self.activation)
        self.critic = MLP(self.critic_hidden, 1, self.activation)
        # std is the raw parameter (rsl_rl keeps it positive only implicitly)
        self.std = self.param(
            "std",
            lambda key, shape: jnp.full(shape, self.init_noise_std),
            (self.num_actions,),
        )

    def __call__(self, obs):
        """Returns (mu, std, value)."""
        mu = self.actor(obs)
        v = self.critic(obs)[..., 0]
        std = jnp.broadcast_to(self.std, mu.shape)
        if self.std_floor > 0.0:
            std = jnp.maximum(std, self.std_floor)
        return mu, std, v

    def act_inference(self, obs):
        return self.actor(obs)

    def value(self, obs):
        return self.critic(obs)[..., 0]


class ActorCriticRecurrent(nn.Module):
    """rsl_rl's ActorCriticRecurrent: an LSTM memory in front of each MLP
    (referenced by the config's commented rnn options,
    envs/nightmare_v3_config.py:110-113, imported in play.py:12).

    Hidden state is carried by the caller as ``((hA, cA), (hC, cC))`` with
    shape (batch, rnn_hidden); reset it where episodes end."""

    num_actions: int
    actor_hidden: Sequence[int] = (54, 42, 30)
    critic_hidden: Sequence[int] = (54, 42, 30)
    activation: str = "elu"
    init_noise_std: float = 1.0
    rnn_hidden: int = 512
    std_floor: float = 0.0  # see ActorCritic.std_floor

    def setup(self):
        self.memory_a = nn.OptimizedLSTMCell(self.rnn_hidden)
        self.memory_c = nn.OptimizedLSTMCell(self.rnn_hidden)
        self.actor = MLP(self.actor_hidden, self.num_actions, self.activation)
        self.critic = MLP(self.critic_hidden, 1, self.activation)
        self.std = self.param(
            "std",
            lambda key, shape: jnp.full(shape, self.init_noise_std),
            (self.num_actions,),
        )

    def initial_state(self, batch: int, dtype=jnp.float32):
        z = jnp.zeros((batch, self.rnn_hidden), dtype)
        return ((z, z), (z, z))

    def __call__(self, obs, hidden):
        """One step: (mu, std, value), new_hidden.  obs: (batch, num_obs);
        hidden = (actor LSTM carry, critic LSTM carry), each flax (c, h)."""
        carry_a, carry_c = hidden
        carry_a, out_a = self.memory_a(carry_a, obs)
        carry_c, out_c = self.memory_c(carry_c, obs)
        mu = self.actor(out_a)
        v = self.critic(out_c)[..., 0]
        std = jnp.broadcast_to(self.std, mu.shape)
        if self.std_floor > 0.0:
            std = jnp.maximum(std, self.std_floor)
        return (mu, std, v), (carry_a, carry_c)


def reset_hidden(hidden, done):
    """Zero the hidden state of finished envs (done: (batch,) bool)."""
    keep = (~done)[:, None]
    return jax.tree_util.tree_map(lambda h: h * keep, hidden)


def sample_action(key, mu, std):
    return mu + std * jax.random.normal(key, mu.shape, mu.dtype)


def log_prob(mu, std, action):
    """Diagonal Gaussian log-density, summed over the action dim."""
    var = jnp.square(std)
    lp = -0.5 * (
        jnp.square(action - mu) / var + 2.0 * jnp.log(std) + jnp.log(2.0 * jnp.pi)
    )
    return jnp.sum(lp, axis=-1)


def entropy(std):
    return jnp.sum(0.5 * (1.0 + jnp.log(2.0 * jnp.pi)) + jnp.log(std), axis=-1)


def gaussian_kl(mu_old, std_old, mu_new, std_new):
    """rsl_rl's adaptive-lr KL: sum over dims of
    log(σ'/σ) + (σ² + (μ−μ')²)/(2σ'²) − ½."""
    return jnp.sum(
        jnp.log(std_new / std_old)
        + (jnp.square(std_old) + jnp.square(mu_old - mu_new))
        / (2.0 * jnp.square(std_new))
        - 0.5,
        axis=-1,
    )
