"""ANYmal-C quadruped velocity-command task (BASELINE config 4).

The reference ships the anymal_c model (models/anymal_c/anymal_c.xml —
12 position actuators kp=100, sphere feet, Newton solver + elliptic cones
with impratio=100, anymal_c.xml:4) but no env code for it; this env proves
the physics/task machinery is morphology-generic at the same fidelity as the
nightmare_v3 flagship: per-term episode reward metrics, feet-air-time and
contact-force rewards driven by the synthesized foot touch sensors
(physics/loader.py synthesizes one per plane-colliding sphere), torque
penalties from the actual position-servo actuator forces, and the standard
legged-robot action law (target = default + action·scale, vs the hexapod's
velocity-servo law).

Physics: the compiled system keeps the model's Newton + elliptic-cone solver
(impratio 100); `AnymalCCfg.solver_iterations` caps the Newton iterations at
a budget that is converged for walking states (Newton reaches ~1e-8 in 2-5
iterations; the XML's 100 is a worst-case bound).  Model dt = 0.002 s,
decimation 4 → 8 ms control step.

Obs (48): [lin_vel·2 | ang_vel·0.25 | proj_gravity | cmd·(2,2,0.25) |
(q−q_def)·1 | q̇·0.05 | prev_actions].
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from nightmare_rl_tpu.core import quat as Q
from nightmare_rl_tpu.physics import loader, pipeline
from nightmare_rl_tpu.physics import system as S

# registration order mirrors the nightmare_v3 convention (alphabetical-free
# fixed list; termination first so it can be reported like the reference's)
REWARD_NAMES = [
    "termination", "tracking_lin_vel", "tracking_ang_vel", "lin_vel_z",
    "ang_vel_xy", "orientation", "torques", "dof_acc", "action_rate",
    "feet_air_time", "feet_contact_forces", "stand_still",
]


@dataclass(frozen=True)
class AnymalCCfg:
    num_envs: int = 4096
    num_actions: int = 12
    num_obs: int = 48
    episode_length_s: float = 20.0
    action_scale: float = 0.5
    decimation: int = 4          # model dt = 0.002 s -> 8 ms control
    max_lin_vel_x: float = 1.0
    max_lin_vel_y: float = 0.5
    max_ang_vel: float = 1.0
    resampling_time: float = 10.0
    tracking_sigma: float = 0.25
    # Newton iteration budget (converged for walking; XML bound is 100)
    solver_iterations: int = 8
    max_contacts: int = 8
    termination_contact_force: float = 700.0   # N on any single foot
    max_contact_force: float = 500.0           # soft feet-force penalty knee
    # reward scales (legged_gym-style flat-terrain defaults), multiplied by
    # the control dt at env build like the reference (:123-128)
    rew_termination: float = -200.0
    rew_tracking_lin_vel: float = 1.0
    rew_tracking_ang_vel: float = 0.5
    rew_lin_vel_z: float = -2.0
    rew_ang_vel_xy: float = -0.05
    rew_orientation: float = -5.0
    rew_torques: float = -2.5e-5
    rew_dof_acc: float = -2.5e-7
    rew_action_rate: float = -0.01
    rew_feet_air_time: float = 1.0
    rew_feet_contact_forces: float = -1e-3
    rew_stand_still: float = 0.0


@struct.dataclass
class EnvState:
    phys: S.State
    rng: jnp.ndarray
    episode_length: jnp.ndarray
    commands: jnp.ndarray        # (3,)
    actions: jnp.ndarray         # (12,)
    dof_vel: jnp.ndarray         # (12,)
    feet_air_time: jnp.ndarray   # (4,)
    last_contacts: jnp.ndarray   # (4,) bool
    episode_sums: jnp.ndarray    # (n_active_terms,)
    obs: jnp.ndarray             # (48,)
    reset_buf: jnp.ndarray
    time_out_buf: jnp.ndarray


class StepOut(NamedTuple):
    state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray
    reward_terms: jnp.ndarray
    finished_episode_sums: jnp.ndarray
    # post-step pre-reset physics state for trajectory recording
    record_qpos: jnp.ndarray = ()
    record_qvel: jnp.ndarray = ()


class AnymalCEnv:
    def __init__(self, cfg: AnymalCCfg = AnymalCCfg(), sys=None,
                 dtype=jnp.float32):
        self.cfg = cfg
        if sys is None:
            sys = loader.load_system("anymal_c")
        sys = S.tree_cast(sys, dtype)
        sys = dataclasses.replace(
            sys, solver_iterations=cfg.solver_iterations,
            max_contacts=cfg.max_contacts,
        )
        self.sys = sys
        self.dtype = dtype
        self.num_envs = cfg.num_envs
        self.num_obs = cfg.num_obs
        self.num_privileged_obs = cfg.num_obs
        self.num_actions = cfg.num_actions
        self.num_feet = int(sys.nsensor)  # synthesized foot touch sensors
        self.dt = float(sys.timestep) * cfg.decimation
        self.max_episode_length = int(
            np.ceil(cfg.episode_length_s / self.dt)
        )
        self.max_episode_length_s = cfg.episode_length_s
        self.default_dof_pos = jnp.asarray(sys.qpos0[7:], dtype)
        scales = {n: getattr(cfg, "rew_" + n) for n in REWARD_NAMES}
        self.active_rewards = [n for n in REWARD_NAMES if scales[n] != 0.0]
        self.reward_scales = jnp.array(
            [scales[n] * self.dt for n in self.active_rewards], dtype
        )
        # the Newton solver's curvature math NaNs under the TPU default
        # (bf16-accumulated) matmul precision — the PGS hexapod survives it,
        # Newton's line search does not.  Trace the physics at full f32
        # matmul precision (no-op on CPU; measured fix on the axon TPU).
        def _step_hp(state, action):
            with jax.default_matmul_precision("float32"):
                return self._step_one(state, action)

        def _init_hp(key):
            with jax.default_matmul_precision("float32"):
                return self._init_one(key)

        self._step_batch = jax.jit(jax.vmap(_step_hp))
        self._init_batch = jax.jit(jax.vmap(_init_hp))

    def _sample_commands(self, key):
        c = self.cfg
        kx, ky, kz = jax.random.split(key, 3)
        vx = jax.random.uniform(kx, (), self.dtype, -c.max_lin_vel_x, c.max_lin_vel_x)
        vy = jax.random.uniform(ky, (), self.dtype, -c.max_lin_vel_y, c.max_lin_vel_y)
        wz = jax.random.uniform(kz, (), self.dtype, -c.max_ang_vel, c.max_ang_vel)
        xy = jnp.stack([vx, vy])
        xy = xy * (jnp.linalg.norm(xy) > 0.05)
        return jnp.concatenate([xy, wz[None]])

    def _init_one(self, rng) -> EnvState:
        phys = pipeline.make_state(self.sys)
        rng, k = jax.random.split(rng)
        return EnvState(
            phys=phys,
            rng=rng,
            episode_length=jnp.zeros((), jnp.int32),
            commands=self._sample_commands(k),
            actions=jnp.zeros(12, self.dtype),
            dof_vel=jnp.zeros(12, self.dtype),
            feet_air_time=jnp.zeros(self.num_feet, self.dtype),
            last_contacts=jnp.zeros(self.num_feet, bool),
            episode_sums=jnp.zeros(len(self.active_rewards), self.dtype),
            obs=jnp.zeros(self.num_obs, self.dtype),
            reset_buf=jnp.ones((), bool),
            time_out_buf=jnp.zeros((), bool),
        )

    def _step_one(self, state: EnvState, raw_actions) -> StepOut:
        cfg = self.cfg
        sys = self.sys
        dtype = self.dtype

        prev_actions = state.actions
        actions = jnp.clip(raw_actions.astype(dtype), -100.0, 100.0)
        # position servo: target angle = default + action·scale
        ctrl = self.default_dof_pos + actions * cfg.action_scale
        phys = pipeline.step(sys, state.phys, ctrl, cfg.decimation)

        episode_length = state.episode_length + 1
        base_quat = Q.conj(phys.qpos[3:7])
        lin_vel = Q.rotate(phys.cvel[1, 3:6], base_quat)
        ang_vel = Q.rotate(phys.cvel[1, :3], base_quat)
        gravity = Q.rotate(jnp.array([0.0, 0.0, -9.81], dtype), base_quat)
        dof_pos = phys.qpos[7:]
        dof_vel = phys.qvel[6:]
        dof_acc = (dof_vel - state.dof_vel) / self.dt
        torques = phys.qfrc_actuator[6:]
        feet_forces = phys.sensordata[: self.num_feet]

        rng, k = jax.random.split(state.rng)
        resample_every = int(cfg.resampling_time / self.dt)
        commands = jnp.where(
            episode_length % resample_every == 0,
            self._sample_commands(k), state.commands,
        )

        time_out = episode_length > self.max_episode_length
        tilt = jnp.arccos(jnp.clip(-gravity[2] / 9.81, -1.0, 1.0))
        reset = time_out | (tilt > jnp.pi / 3)
        reset |= feet_forces.max() > cfg.termination_contact_force

        rng, kr = jax.random.split(rng)
        commands = jnp.where(reset, self._sample_commands(kr), commands)
        rec_qpos, rec_qvel = phys.qpos, phys.qvel  # pre-reset, for recording
        phys = phys.replace(
            qpos=jnp.where(reset, sys.qpos0.astype(dtype), phys.qpos),
            qvel=jnp.where(reset, jnp.zeros_like(phys.qvel), phys.qvel),
        )
        episode_length = jnp.where(reset, 0, episode_length)
        finished = jnp.where(reset, state.episode_sums, jnp.nan)
        episode_sums = jnp.where(reset, 0.0, state.episode_sums)
        feet_air_time = jnp.where(reset, 0.0, state.feet_air_time)

        # feet air time (legged_gym): reward the first contact after a
        # swing, target swing duration 0.5 s, only while commanded to move
        contact = feet_forces > 1.0
        contact_filt = jnp.logical_or(contact, state.last_contacts)
        first_contact = (feet_air_time > 0.0) & contact_filt
        fat = feet_air_time + self.dt
        rew_air = jnp.sum((fat - 0.5) * first_contact) * (
            jnp.linalg.norm(commands[:2]) > 0.1
        )
        feet_air_time_new = fat * (~contact_filt)

        sigma = cfg.tracking_sigma
        values = {
            "termination": (reset & ~time_out).astype(dtype),
            "tracking_lin_vel": jnp.exp(
                -jnp.sum(jnp.square(commands[:2] - lin_vel[:2])) / sigma
            ),
            "tracking_ang_vel": jnp.exp(
                -jnp.square(commands[2] - ang_vel[2]) / sigma
            ),
            "lin_vel_z": jnp.square(lin_vel[2]),
            "ang_vel_xy": jnp.sum(jnp.square(ang_vel[:2])),
            "orientation": jnp.sum(jnp.square(gravity[:2] / 9.81)),
            "torques": jnp.sum(jnp.square(torques)),
            "dof_acc": jnp.sum(jnp.square(dof_acc)),
            "action_rate": jnp.sum(jnp.square(actions - prev_actions)),
            "feet_air_time": rew_air,
            "feet_contact_forces": jnp.sum(
                jnp.square(
                    (feet_forces - cfg.max_contact_force)
                    * (feet_forces > cfg.max_contact_force)
                )
            ),
            "stand_still": jnp.sum(jnp.abs(dof_pos - self.default_dof_pos))
            * (jnp.linalg.norm(commands[:2]) < 0.1),
        }
        reward_terms = (
            jnp.stack([values[n] for n in self.active_rewards])
            * self.reward_scales
        )
        rew = jnp.sum(reward_terms)
        episode_sums = episode_sums + reward_terms

        cmd_scale = jnp.array([2.0, 2.0, 0.25], dtype)
        obs = jnp.concatenate([
            lin_vel * 2.0,
            ang_vel * 0.25,
            gravity / 9.81,
            commands * cmd_scale,
            dof_pos - self.default_dof_pos,
            dof_vel * 0.05,
            actions,
        ])
        obs = jnp.clip(obs, -100.0, 100.0)

        new_state = EnvState(
            phys=phys, rng=rng, episode_length=episode_length,
            commands=commands, actions=actions, dof_vel=dof_vel,
            feet_air_time=feet_air_time_new,
            last_contacts=contact,
            episode_sums=episode_sums, obs=obs,
            reset_buf=reset, time_out_buf=time_out,
        )
        return StepOut(new_state, obs, rew.astype(dtype), reset, time_out,
                       reward_terms, finished,
                       record_qpos=rec_qpos, record_qvel=rec_qvel)

    # -- batched API --
    def init(self, seed: int = 0):
        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_envs)
        return self._init_batch(keys)

    def step(self, state, actions):
        return self._step_batch(state, actions)

    def reset(self, seed: int = 0) -> Tuple[EnvState, jnp.ndarray]:
        state = self.init(seed)
        out = self.step(
            state, jnp.zeros((self.num_envs, self.num_actions), self.dtype)
        )
        return out.state, out.obs
