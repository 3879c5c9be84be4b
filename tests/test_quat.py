"""core.quat parity vs the MuJoCo mju_* oracle functions.

The reference env relies on mju_negQuat / mju_rotVecQuat
(nightmare_rl envs/nightmare_v3_env.py:216-219); our ops must match bitwise-
tight in float64.
"""

import mujoco as mj
import numpy as np
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.core import quat

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_conj_matches_mju_negQuat():
    qs = random_quats(64)
    ours = np.asarray(quat.conj(jnp.array(qs)))
    for q, o in zip(qs, ours):
        ref = np.zeros(4)
        mj.mju_negQuat(ref, q)
        np.testing.assert_allclose(o, ref, atol=1e-14)


def test_rotate_matches_mju_rotVecQuat():
    qs = random_quats(64)
    vs = RNG.normal(size=(64, 3))
    ours = np.asarray(quat.rotate(jnp.array(vs), jnp.array(qs)))
    for q, v, o in zip(qs, vs, ours):
        ref = np.zeros(3)
        mj.mju_rotVecQuat(ref, v, q)
        np.testing.assert_allclose(o, ref, atol=1e-12)


def test_mul_matches_mju_mulQuat():
    a, b = random_quats(32), random_quats(32)
    ours = np.asarray(quat.mul(jnp.array(a), jnp.array(b)))
    for qa, qb, o in zip(a, b, ours):
        ref = np.zeros(4)
        mj.mju_mulQuat(ref, qa, qb)
        np.testing.assert_allclose(o, ref, atol=1e-14)


def test_to_mat_matches_mju_quat2Mat():
    qs = random_quats(32)
    ours = np.asarray(quat.to_mat(jnp.array(qs)))
    for q, o in zip(qs, ours):
        ref = np.zeros(9)
        mj.mju_quat2Mat(ref, q)
        np.testing.assert_allclose(o, ref.reshape(3, 3), atol=1e-14)


def test_from_mat_roundtrip():
    qs = random_quats(64)
    qs *= np.where(qs[:, :1] < 0, -1.0, 1.0)  # canonical sign
    m = quat.to_mat(jnp.array(qs))
    back = np.asarray(quat.from_mat(m))
    np.testing.assert_allclose(back, qs, atol=1e-12)


def test_integrate_matches_mju_quatIntegrate():
    qs = random_quats(32)
    omegas = RNG.normal(size=(32, 3)) * 3.0
    dt = 0.008
    ours = np.asarray(quat.integrate(jnp.array(qs), jnp.array(omegas), dt))
    for q, w, o in zip(qs, omegas, ours):
        ref = q.copy()
        mj.mju_quatIntegrate(ref, w, dt)
        np.testing.assert_allclose(o, ref, atol=1e-12)


def test_rotate_inv_projects_world_to_body():
    # the reference's projected-gravity computation: rotVecQuat(g, negQuat(q))
    qs = random_quats(16)
    g = np.array([0.0, 0.0, -9.81])
    ours = np.asarray(quat.rotate_inv(jnp.array(g), jnp.array(qs)))
    for q, o in zip(qs, ours):
        neg = np.zeros(4)
        mj.mju_negQuat(neg, q)
        ref = np.zeros(3)
        mj.mju_rotVecQuat(ref, g, neg)
        np.testing.assert_allclose(o, ref, atol=1e-12)
