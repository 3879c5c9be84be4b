"""Trajectory recording: device→host state streaming + pickle archives.

Equivalent of the reference's episode recorder, which appends env 0's
``(time, qpos, qvel, act)`` each control step and pickles the list when env 0
resets (nightmare_rl envs/nightmare_v3_env.py:261-272), replayed by
``open_custom_play.py``.  Same on-disk format (a pickled list of tuples) so
the reference's replayer could read our files.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import List, Tuple

import numpy as np


class StateRecorder:
    def __init__(self, log_dir: str, env_index: int = 0):
        self.log_dir = log_dir
        self.env_index = env_index
        self._states: List[Tuple[float, np.ndarray, np.ndarray, np.ndarray]] = []
        self._t = 0.0

    def record(self, env_state, dt: float) -> None:
        """Append env_index's physics state; flush to pkl when it resets."""
        i = self.env_index
        if bool(np.asarray(env_state.reset_buf)[i]):
            self.flush()
        qpos = np.asarray(env_state.phys.qpos[i])
        qvel = np.asarray(env_state.phys.qvel[i])
        self._states.append((self._t, qpos.copy(), qvel.copy(), np.zeros(0)))
        self._t += dt

    def flush(self) -> None:
        if not self._states:
            return
        os.makedirs(self.log_dir, exist_ok=True)
        path = os.path.join(self.log_dir, f"{int(time.time())}.pkl")
        with open(path, "wb") as f:
            pickle.dump(self._states, f)
        self._states = []


def load_recording(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
