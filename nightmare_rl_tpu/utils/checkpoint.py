"""Orbax checkpointing: params + optimizer + env state + RNG in one pytree.

TPU-native replacement for the reference's torch ``model_<iter>.pt`` files
(rsl_rl saves model_state_dict + optimizer every save_interval;
envs/helpers.py:35-39, play.py:71).  Saving the full TrainState (including env
state and RNG) gives deterministic resume, which the reference lacks.
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, tree) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _checkpointer().save(path, jax.device_get(tree), force=True)


def restore(path: str, target):
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=jax.device_get(target))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r), target, restored)
