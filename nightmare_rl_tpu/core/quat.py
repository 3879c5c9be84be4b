"""Quaternion / rotation math with MuJoCo semantics.

Conventions (matching the reference's use of ``mju_negQuat`` / ``mju_rotVecQuat``
in nightmare_rl ``envs/nightmare_v3_env.py:216-219``):

- Quaternions are ``(w, x, y, z)``, unit norm, representing active rotations:
  ``rotate(v, q) = R(q) @ v`` maps a vector from the local frame to the frame
  the quaternion is expressed in.
- ``conj(q)`` is ``mju_negQuat``; rotating a world vector by the conjugate of a
  body quaternion expresses it in the body frame.

All functions are shape-polymorphic over leading batch dimensions and traceable
under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Return the unit quaternion (safe for zero input)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def conj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (``mju_negQuat``): inverse for unit quaternions."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``a ⊗ b`` (``mju_mulQuat``)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotate(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector by quaternion (``mju_rotVecQuat``): ``R(q) @ v``."""
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2 w (u × v) + 2 u × (u × v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rotate_inv(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate by the inverse quaternion: ``R(q)ᵀ @ v``."""
    return rotate(v, conj(q))


def to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → 3×3 rotation matrix (``mju_quat2Mat``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def from_mat(m: jnp.ndarray) -> jnp.ndarray:
    """3×3 rotation matrix → quaternion (branch-free Shepperd)."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # Four candidate constructions; pick the numerically strongest.
    qw = jnp.stack(
        [
            1.0 + tr,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    qx = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    qy = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    qz = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        ],
        axis=-1,
    )
    cases = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    diag = jnp.stack(
        [tr, m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1
    )
    best = jnp.argmax(diag, axis=-1)
    q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis + angle → quaternion (``mju_axisAngle2Quat``)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate local-frame angular velocity over dt (``mju_quatIntegrate``).

    MuJoCo integrates free-joint orientation with the *local-frame* angular
    velocity: q' = q ⊗ exp(½ ω_local dt).
    """
    angle = jnp.linalg.norm(omega, axis=-1)
    # safe normalize: direction irrelevant when angle ~ 0 (sin(0)=0)
    axis = omega / jnp.maximum(angle, 1e-12)[..., None]
    dq = from_axis_angle(axis, angle * dt)
    return normalize(mul(q, dq))
