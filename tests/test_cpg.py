"""Hopf-CPG bank: exact vector field + limit-cycle convergence.

Oracle: the reference's modified_hopf_oscillator / rotate formulas
(envs/nightmare_v3_env.py:18-24), re-evaluated in numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.envs import cpg


def _oracle_deriv(x, y, a, b, mu, w):
    r2 = mu**2 - x**2 - y**2
    return a * r2 * x - w * y, b * r2 * y + w * x


def test_vector_field_matches_reference_formula():
    rng = np.random.default_rng(0)
    x, y = rng.normal(size=(2, 6))
    w = rng.uniform(1.0, 4.0, size=6)
    dx, dy = cpg.hopf_deriv(jnp.asarray(x), jnp.asarray(y), 10.0, 20.0, 1.5, jnp.asarray(w))
    ox, oy = _oracle_deriv(x, y, 10.0, 20.0, 1.5, w)
    np.testing.assert_allclose(np.asarray(dx), ox, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dy), oy, rtol=1e-12)


def test_rotate_matches_reference_formula():
    rng = np.random.default_rng(1)
    x, y = rng.normal(size=(2, 6))
    xr, yr = cpg.rotate(jnp.asarray(x), jnp.asarray(y), jnp.pi / 3)
    ox = x * np.cos(np.pi / 3) - y * np.sin(np.pi / 3)
    oy = x * np.sin(np.pi / 3) + y * np.cos(np.pi / 3)
    np.testing.assert_allclose(np.asarray(xr), ox, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(yr), oy, rtol=1e-12)


def test_limit_cycle_convergence_under_jit_and_vmap():
    n_env, n_osc, mu = 4, 6, 1.3
    state = jax.vmap(lambda _: cpg.init(n_osc))(jnp.arange(n_env))
    freqs = jnp.full((n_env, n_osc), 2.0)

    @jax.jit
    def run(state):
        def body(s, _):
            return cpg.step(s, freqs, mu=mu), None

        return jax.lax.scan(body, state, None, length=2000)[0]

    out = run(state)
    r = np.hypot(np.asarray(out.x), np.asarray(out.y))
    np.testing.assert_allclose(r, mu, atol=1e-3)
    # phases advance at ~w rad/s: check one more step rotates by ~w*dt
    out2 = cpg.step(out, freqs, mu=mu)
    dphi = np.arctan2(np.asarray(out2.y), np.asarray(out2.x)) - np.arctan2(
        np.asarray(out.y), np.asarray(out.x)
    )
    dphi = (dphi + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dphi, 2.0 * 0.01, atol=1e-4)
