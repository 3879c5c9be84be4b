"""Hopf-oscillator central pattern generator (CPG) bank.

The reference carries a vestigial CPG pathway: a modified Hopf oscillator
(``envs/nightmare_v3_env.py:18-21``) plus a phase-coupling rotation
(``:23-24``), with its per-env integration and action-driven frequencies
commented out of the hot loop (``:157-176``) and config knobs implied
(``cfg.oscillators.{a,b,mu,min_freq,max_freq}``).  This module is the
TPU-native equivalent: a pure-JAX oscillator bank that vmaps over envs and
integrates under jit, usable as extra policy-conditioned action channels
exactly as the commented reference code sketches (actions[:, 18:] ->
frequencies, Euler dt = 0.01).

The modified Hopf dynamics converge to a stable limit cycle of radius mu at
angular rate w:

    dx = alpha * (mu^2 - x^2 - y^2) * x - w * y
    dy = beta  * (mu^2 - x^2 - y^2) * y + w * x
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class CPGState(NamedTuple):
    x: jnp.ndarray  # (..., n_osc)
    y: jnp.ndarray  # (..., n_osc)


def init(n_osc: int, dtype=jnp.float32) -> CPGState:
    """Oscillators start on the unit circle with evenly spread phases (the
    standard CPG initialization; the reference never initializes its buffers
    because the pathway is disabled)."""
    phase = jnp.linspace(0.0, 2.0 * jnp.pi, n_osc, endpoint=False, dtype=dtype)
    return CPGState(jnp.cos(phase), jnp.sin(phase))


def hopf_deriv(
    x: jnp.ndarray,
    y: jnp.ndarray,
    alpha: float,
    beta: float,
    mu: float,
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Modified Hopf vector field (envs/nightmare_v3_env.py:18-21)."""
    r2 = mu * mu - x * x - y * y
    return alpha * r2 * x - w * y, beta * r2 * y + w * x


def rotate(
    xs: jnp.ndarray, ys: jnp.ndarray, angle: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase-coupling rotation (envs/nightmare_v3_env.py:23-24)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return xs * c - ys * s, xs * s + ys * c


def step(
    state: CPGState,
    freqs: jnp.ndarray,
    alpha: float = 50.0,
    beta: float = 50.0,
    mu: float = 1.0,
    dt: float = 0.01,
) -> CPGState:
    """One Euler step at the reference's commented dt
    (envs/nightmare_v3_env.py:172-173).  ``freqs`` are the action-driven
    angular rates (clip upstream to [min_freq, max_freq] like the reference's
    commented cpg_actions handling, :158)."""
    dx, dy = hopf_deriv(state.x, state.y, alpha, beta, mu, freqs)
    return CPGState(state.x + dx * dt, state.y + dy * dt)
