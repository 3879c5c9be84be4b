"""Nightmare v3 hexapod velocity-command task, pure-JAX lockstep batch.

Behavioral re-derivation of the reference env (nightmare_rl
``envs/nightmare_v3_env.py``), including its deliberate quirks:

- control law: ``ctrl = ((a·scale clipped) − default_pos − dof_pos_read)·p_gain``
  where ``dof_pos_read`` is the *last post-step reading* — after a reset the
  first control still uses the pre-reset reading (:183-188 + reset_idx not
  refreshing buffers).
- tibia touch forces zeroed where the foot force is nonzero (:230-232).
- rewards are computed *after* reset bookkeeping, so the terminal step's
  reward lands in the new episode's sums (:274-288).
- observations returned for reset envs are the terminal-state obs; the fresh
  state is first observed on the next step (:291-311).
- commands resample every ``resampling_time/dt`` steps per env and on reset,
  with vy forced to 0 and small commands zeroed (:321-333).
- termination: timeout (len > 1250), any foot force > 160, tilt > 60°
  (:239-256); tibia/body contact modes 1 = penalty not termination.

Everything here is per-env; ``NightmareV3Env`` vmaps + jits over the batch.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.core import quat as Q
from nightmare_rl_tpu.core.config import NightmareV3Cfg
from nightmare_rl_tpu.physics import loader, pipeline
from nightmare_rl_tpu.physics import system as S
from flax import struct

# reward functions active in the reference config, in its registration order
# (dict order of class_to_dict = alphabetical via dir(), envs/helpers.py:8;
# the reference iterates that order minus 'termination')
REWARD_NAMES = [
    "termination", "tracking_lin_vel", "tracking_ang_vel", "dof_acc",
    "action_rate", "body_contact_forces", "default_position", "orientation",
    "lin_vel_z", "ang_vel_xy", "feet_air_time", "torques", "base_height",
    "feet_contact_forces", "dof_vel", "stand_still",
]


@struct.dataclass
class EnvState:
    phys: S.State
    rng: jnp.ndarray
    episode_length: jnp.ndarray      # () int32
    commands: jnp.ndarray            # (3,)
    actions: jnp.ndarray             # (18,) scaled+clipped actions
    # last post-step sensor readings (the reference's numpy buffers)
    dof_pos: jnp.ndarray             # (18,)
    dof_vel: jnp.ndarray             # (18,)
    feet_air_time: jnp.ndarray       # (6,)
    last_contacts: jnp.ndarray       # (6,) bool
    last_contacts_filt: jnp.ndarray  # (6,) bool
    episode_sums: jnp.ndarray        # (n_reward_terms,)
    obs: jnp.ndarray                 # (66,)
    reset_buf: jnp.ndarray           # () bool — done flag of the last step
    time_out_buf: jnp.ndarray        # () bool


class StepOut(NamedTuple):
    state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray
    # per-term rewards of this step (for episode metrics)
    reward_terms: jnp.ndarray
    # episode sums captured at reset (nan where not reset) for metrics
    finished_episode_sums: jnp.ndarray
    # post-step PRE-reset physics state, for training-time trajectory
    # recording (the reference records env 0 before reset_idx runs,
    # envs/nightmare_v3_env.py:261-274); DCE'd by XLA when unused
    record_qpos: jnp.ndarray = ()
    record_qvel: jnp.ndarray = ()


def _gravity_vec(dtype):
    return jnp.array([0.0, 0.0, -9.81], dtype)


class NightmareV3Env:
    """Batched lockstep env with the rsl_rl-style contract
    (num_envs/num_obs/num_actions/max_episode_length, step/reset)."""

    def __init__(self, cfg: NightmareV3Cfg, sys: S.System | None = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        if sys is None:
            sys = loader.load_system(cfg.env.model_name)
        import dataclasses

        sys = S.tree_cast(sys, dtype)
        if cfg.solver.iterations is not None:
            sys = dataclasses.replace(sys, solver_iterations=cfg.solver.iterations)
        if cfg.solver.noslip_iterations is not None:
            sys = dataclasses.replace(
                sys, noslip_iterations=cfg.solver.noslip_iterations
            )
        sys = dataclasses.replace(sys, max_contacts=cfg.solver.max_contacts)
        self.sys = sys
        self.dtype = dtype

        self.num_envs = cfg.env.num_envs
        self.num_obs = cfg.env.num_obs
        self.num_privileged_obs = cfg.env.num_obs  # mirror reference (:34)
        self.num_actions = cfg.env.num_actions
        self.dt = float(sys.timestep) * cfg.control.decimation
        self.max_episode_length_s = cfg.env.episode_length_s
        self.max_episode_length = int(np.ceil(self.max_episode_length_s / self.dt))

        self.default_dof_pos = jnp.array(cfg.control.default_pos, dtype)

        # reward scales premultiplied by dt, zeros dropped (reference :123-128)
        scales = {
            name: getattr(cfg.rewards.scales, name) for name in REWARD_NAMES
        }
        self.active_rewards = [n for n in REWARD_NAMES if scales[n] != 0.0]
        self.reward_scales = jnp.array(
            [scales[n] * self.dt for n in self.active_rewards], dtype
        )

        # run the PGS dispatch probe now, outside any trace (ops/pgs.py)
        from nightmare_rl_tpu.physics import solver

        solver.prewarm(sys)

        self._step_batch = jax.jit(jax.vmap(self._step_one, in_axes=(0, 0)))
        self._init_batch = jax.jit(jax.vmap(self._init_one))

    # ------------------------------------------------------------------
    # single-env logic
    # ------------------------------------------------------------------

    def _init_one(self, rng) -> EnvState:
        dtype = self.dtype
        phys = pipeline.make_state(self.sys)
        rng, k = jax.random.split(rng)
        commands = self._sample_commands(k)
        n_rew = len(self.active_rewards)
        return EnvState(
            phys=phys,
            rng=rng,
            episode_length=jnp.zeros((), jnp.int32),
            commands=commands,
            actions=jnp.zeros(18, dtype),
            dof_pos=phys.qpos[7:].astype(dtype),
            dof_vel=jnp.zeros(18, dtype),
            feet_air_time=jnp.zeros(6, dtype),
            last_contacts=jnp.zeros(6, bool),
            last_contacts_filt=jnp.zeros(6, bool),
            episode_sums=jnp.zeros(n_rew, dtype),
            obs=jnp.zeros(self.num_obs, dtype),
            reset_buf=jnp.ones((), bool),
            time_out_buf=jnp.zeros((), bool),
        )

    def _sample_commands(self, key) -> jnp.ndarray:
        """_resample_commands (:321-333): vx ∈ ±max_lin_vel_x, vy ≡ 0,
        ωz ∈ ±max_ang_vel; zero xy commands with norm ≤ 0.02."""
        r = self.cfg.commands.ranges
        kx, kz = jax.random.split(key)
        vx = jax.random.uniform(kx, (), self.dtype, -r.max_lin_vel_x, r.max_lin_vel_x)
        wz = jax.random.uniform(kz, (), self.dtype, -r.max_ang_vel, r.max_ang_vel)
        vy = jnp.zeros((), self.dtype)
        xy = jnp.stack([vx, vy])
        xy = xy * (jnp.linalg.norm(xy) > 0.02)
        return jnp.concatenate([xy, wz[None]])

    def _step_one(self, state: EnvState, raw_actions: jnp.ndarray) -> StepOut:
        cfg = self.cfg
        sys = self.sys
        dtype = self.dtype
        dt = self.dt

        prev_actions = state.actions
        scaled = raw_actions.astype(dtype) * cfg.control.action_scale
        actions = jnp.clip(
            scaled, -cfg.normalization.clip_actions, cfg.normalization.clip_actions
        )

        prev_dof_vel = state.dof_vel

        # control law (:183-188) — uses last READ dof_pos (possibly stale
        # across resets, mirroring the reference buffers)
        dof_actions = actions - self.default_dof_pos
        ctrl = (dof_actions - state.dof_pos) * cfg.control.p_gain

        phys = pipeline.step(sys, state.phys, ctrl, cfg.control.decimation)

        episode_length = state.episode_length + 1

        # readings (:216-232)
        base_quat = Q.conj(phys.qpos[3:7])
        body = 1  # base_link
        base_lin_vel = Q.rotate(phys.cvel[body, 3:6], base_quat)
        base_ang_vel = Q.rotate(phys.cvel[body, :3], base_quat)
        projected_gravity = Q.rotate(_gravity_vec(dtype), base_quat)
        dof_pos = phys.qpos[7:]
        dof_vel = phys.qvel[6:]
        base_height = phys.xipos[body, 2]
        tibia_forces = phys.sensordata[0:6]
        feet_forces = phys.sensordata[6:12]
        body_force = phys.sensordata[12]
        tibia_forces = tibia_forces * (feet_forces == 0)

        dof_acc = (dof_vel - prev_dof_vel) / dt

        # command resampling (:235-236)
        resample_every = int(cfg.commands.resampling_time / dt)
        rng, k = jax.random.split(state.rng)
        new_cmd = self._sample_commands(k)
        commands = jnp.where(
            episode_length % resample_every == 0, new_cmd, state.commands
        )

        # termination (:239-256)
        time_out = episode_length > self.max_episode_length
        reset = time_out
        reset |= feet_forces.max() > cfg.env.termination_contact_force
        if cfg.env.tibia_contact_mode == 2:
            reset |= tibia_forces.max() > cfg.env.tibia_max_contact_force
        if cfg.env.body_contact_mode == 2:
            reset |= body_force > cfg.env.body_max_contact_force
        max_angle = 60.0 * jnp.pi / 180.0
        down = jnp.array([0.0, 0.0, -1.0], dtype)
        cosang = jnp.dot(projected_gravity, down) / jnp.maximum(
            jnp.linalg.norm(projected_gravity), 1e-9
        )
        reset |= jnp.arccos(jnp.clip(cosang, -1.0, 1.0)) > max_angle

        # ---- reset bookkeeping BEFORE rewards (reference order :274-288) ----
        rng, kr = jax.random.split(rng)
        reset_cmd = self._sample_commands(kr)
        qpos0 = sys.qpos0.astype(dtype)
        phys_reset = phys.replace(
            qpos=jnp.where(reset, qpos0, phys.qpos),
            qvel=jnp.where(reset, jnp.zeros_like(phys.qvel), phys.qvel),
        )
        commands = jnp.where(reset, reset_cmd, commands)
        feet_air_time = jnp.where(reset, 0.0, state.feet_air_time)
        episode_length = jnp.where(reset, 0, episode_length)
        finished_sums = jnp.where(reset, state.episode_sums, jnp.nan)
        episode_sums = jnp.where(reset, 0.0, state.episode_sums)

        # ---- feet_air_time stateful update (runs only if term active) ----
        contact = feet_forces > 1.0
        contact_filt = jnp.logical_or(contact, state.last_contacts)
        fat = state.feet_air_time + dt
        fat = fat * (contact_filt == state.last_contacts_filt)
        # NB: the reference updates these buffers inside the reward fn, which
        # only runs when the scale is nonzero; default scale is 0 so the
        # buffers stay frozen — mirror that exactly.
        if "feet_air_time" in self.active_rewards:
            last_contacts = contact
            last_contacts_filt = contact_filt
            feet_air_time_new = fat
        else:
            last_contacts = state.last_contacts
            last_contacts_filt = state.last_contacts_filt
            feet_air_time_new = feet_air_time

        # ---- rewards (:277-288, functions :399-497) ----
        torques = jnp.zeros(18, dtype)  # qfrc_applied is never set (:222)
        r = cfg.rewards
        values = {
            "lin_vel_z": jnp.square(base_lin_vel[2]),
            "ang_vel_xy": jnp.sum(jnp.square(base_ang_vel[:2])),
            "orientation": jnp.sum(jnp.square(projected_gravity[:2])),
            "base_height": jnp.square(base_height - r.base_height_target),
            "torques": jnp.sum(jnp.square(torques)),
            "dof_vel": jnp.sum(jnp.square(dof_vel)),
            "dof_acc": jnp.sum(jnp.square(dof_acc)),
            "action_rate": jnp.sum(jnp.square(prev_actions - actions)),
            "termination": (reset & ~time_out).astype(dtype),
            "tracking_lin_vel": jnp.exp(
                -jnp.sum(jnp.square(commands[:2] - base_lin_vel[:2]))
                / r.tracking_sigma
            ),
            "tracking_ang_vel": jnp.exp(
                -jnp.square(commands[2] - base_ang_vel[2]) / r.tracking_sigma
            ),
            "feet_air_time": jnp.sum(
                jnp.square(
                    (fat > 1.0) * (fat - 1.0) + (fat < 0.5) * (0.5 - fat)
                )
            ),
            "body_contact_forces": (
                (jnp.sum(tibia_forces) if cfg.env.tibia_contact_mode == 1 else 0.0)
                + (body_force if cfg.env.body_contact_mode == 1 else 0.0)
            ),
            "stand_still": jnp.sum(jnp.abs(dof_pos - self.default_dof_pos))
            * (jnp.linalg.norm(commands[:2]) < 0.01),
            "feet_contact_forces": jnp.sum(
                jnp.square(
                    (feet_forces - r.max_contact_force)
                    * (feet_forces > r.max_contact_force)
                )
            ),
            "default_position": jnp.sum(
                jnp.square(dof_pos - self.default_dof_pos)
            ),
        }
        reward_terms = (
            jnp.stack([values[n] for n in self.active_rewards])
            * self.reward_scales
        )
        reward = jnp.sum(reward_terms)
        episode_sums = episode_sums + reward_terms

        # ---- observations (:291-309) ----
        s = cfg.normalization.obs_scales
        cmd_scale = jnp.array([s.lin_vel, s.lin_vel, s.ang_vel], dtype)
        obs = jnp.concatenate(
            [
                base_lin_vel * s.lin_vel,
                base_ang_vel * s.ang_vel,
                projected_gravity,
                commands * cmd_scale,
                (dof_pos - self.default_dof_pos) * s.dof_pos,
                dof_vel * s.dof_vel,
                actions,
            ]
        )
        if cfg.noise.add_noise:
            rng, kn = jax.random.split(rng)
            noise_vec = self._noise_scale_vec()
            obs = obs + (
                2.0 * jax.random.uniform(kn, obs.shape, dtype) - 1.0
            ) * noise_vec
        clip_obs = cfg.normalization.clip_observations
        obs = jnp.clip(obs, -clip_obs, clip_obs)

        new_state = EnvState(
            phys=phys_reset,
            rng=rng,
            episode_length=episode_length,
            commands=commands,
            actions=actions,
            dof_pos=dof_pos,
            dof_vel=dof_vel,
            feet_air_time=feet_air_time_new,
            last_contacts=last_contacts,
            last_contacts_filt=last_contacts_filt,
            episode_sums=episode_sums,
            obs=obs,
            reset_buf=reset,
            time_out_buf=time_out,
        )
        return StepOut(
            new_state, obs,
            reward.astype(dtype),
            reset, time_out, reward_terms, finished_sums,
            record_qpos=phys.qpos, record_qvel=phys.qvel,
        )

    def _noise_scale_vec(self) -> jnp.ndarray:
        """Noise vector (:109-119).  NB the reference's dof index ranges are
        stale 12-DoF offsets (12:24, 24:36) — reproduced verbatim since the
        noise path is inert by default (add_noise=False)."""
        cfg = self.cfg
        s = cfg.normalization.obs_scales
        ns = cfg.noise.noise_scales
        lvl = cfg.noise.noise_level
        v = np.zeros(self.num_obs, dtype=np.float32)
        v[0:3] = ns.lin_vel * lvl * s.lin_vel
        v[3:6] = ns.ang_vel * lvl * s.ang_vel
        v[6:9] = ns.gravity * lvl
        v[12:24] = ns.dof_pos * lvl * s.dof_pos
        v[24:36] = ns.dof_vel * lvl * s.dof_vel
        return jnp.array(v, self.dtype)

    # ------------------------------------------------------------------
    # batched API (rsl_rl VecEnv contract, envs/nightmare_v3_env.py:145,392)
    # ------------------------------------------------------------------

    def init(self, seed: int = 0) -> EnvState:
        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_envs)
        return self._init_batch(keys)

    def step(self, state: EnvState, actions: jnp.ndarray) -> StepOut:
        """actions: (num_envs, 18) raw policy actions."""
        return self._step_batch(state, actions)

    def reset(self, seed: int = 0) -> Tuple[EnvState, jnp.ndarray]:
        """Fresh batch; like the reference reset(): zero-action step for the
        initial obs (:392-396)."""
        state = self.init(seed)
        out = self.step(state, jnp.zeros((self.num_envs, self.num_actions), self.dtype))
        return out.state, out.obs
