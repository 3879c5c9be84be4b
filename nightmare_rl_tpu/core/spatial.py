"""6-D spatial vector algebra (Featherstone) in MuJoCo layout.

Spatial vectors are ``(..., 6)`` arrays laid out ``[angular(3); linear(3)]``,
expressed in a common world-aligned frame centered at a chosen origin (the
subtree center of mass, matching MuJoCo's com-based internal representation
that the reference consumes via ``data.cvel`` — nightmare_rl
``envs/nightmare_v3_env.py:217-218``).

Spatial inertias are ``(..., 6, 6)`` symmetric matrices in the same frame.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector → skew-symmetric matrix such that ``skew(a) @ b = a × b``."""
    z = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product for motion vectors: ``v ×ₘ m``.

    With v = [w; u], m = [a; b]:  result = [w×a; w×b + u×a].
    """
    w, u = v[..., :3], v[..., 3:]
    a, b = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, a), jnp.cross(w, b) + jnp.cross(u, a)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product for force vectors: ``v ×f f`` (dual of motion).

    With v = [w; u], f = [t; n]:  result = [w×t + u×n; w×n].
    """
    w, u = v[..., :3], v[..., 3:]
    t, n = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, t) + jnp.cross(u, n), jnp.cross(w, n)], axis=-1
    )


def inertia_matrix(
    mass: jnp.ndarray, inertia_world: jnp.ndarray, com_offset: jnp.ndarray
) -> jnp.ndarray:
    """Build the 6×6 spatial inertia about a frame origin.

    Args:
      mass: ``(...,)`` body mass.
      inertia_world: ``(..., 3, 3)`` rotational inertia about the body CoM,
        world-aligned axes.
      com_offset: ``(..., 3)`` vector from the frame origin to the body CoM.

    Returns ``(..., 6, 6)``::

        [ I + m·cxᵀcx ... wait — standard form:
        [ I + m·cx·cxᵀ   m·cx ]
        [ m·cxᵀ          m·1  ]

    where ``cx = skew(com_offset)``.
    """
    cx = skew(com_offset)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    top_left = inertia_world + m * (cx @ cx.swapaxes(-1, -2))
    top_right = m * cx
    bottom_left = m * cx.swapaxes(-1, -2)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def inertia_mul(I: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``I @ v`` for spatial inertia (..., 6, 6) and motion vector (..., 6)."""
    return jnp.einsum("...ij,...j->...i", I, v)
