"""Full physics step: forward dynamics + implicitfast integration + sensors.

The TPU-native equivalent of ``mj_step(model, data, nstep)`` as used by the
reference's hot loop (nightmare_rl ``envs/nightmare_v3_env.py:198-200``):
a pure function ``step(sys, state, ctrl, n)`` that is vmapped over envs and
jitted by the env layer.  Touch sensordata is produced from contact normal
forces through the static sensor membership matrix, replicating MuJoCo's
touch-sensor-site semantics that the reward/termination logic consumes
(``envs/nightmare_v3_env.py:224-226``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.core import quat as Q
from nightmare_rl_tpu.ops import linalg
from nightmare_rl_tpu.physics import arrow, collision, dynamics, kinematics, solver
from nightmare_rl_tpu.physics import system as S


class ForwardOut(NamedTuple):
    kin: kinematics.KinOut
    vel: kinematics.VelOut
    M: jnp.ndarray
    # dense Cholesky of M, or None when the block-arrow factorization was
    # used instead (arrow.layout(sys) is not None) — consumers must handle
    # both; the solver takes M/Minv explicitly for that reason
    M_chol: Optional[jnp.ndarray]
    qfrc_smooth: jnp.ndarray
    qacc_smooth: jnp.ndarray
    con: collision.Contacts
    sol: solver.ContactSolveOut
    act: dynamics.ActOut
    sensordata: jnp.ndarray


def make_state(sys: S.System) -> S.State:
    """Fresh state at the model reference pose (mjData after reset)."""
    dt = sys.dtype
    return S.State(
        qpos=sys.qpos0.astype(dt),
        qvel=jnp.zeros(sys.nv, dt),
        qacc_warmstart=jnp.zeros(sys.nv, dt),
        sensordata=jnp.zeros(sys.nsensor, dt),
        xpos=jnp.zeros((sys.nbody, 3), dt),
        xquat=jnp.zeros((sys.nbody, 4), dt).at[:, 0].set(1.0),
        xipos=jnp.zeros((sys.nbody, 3), dt),
        cvel=jnp.zeros((sys.nbody, 6), dt),
        subtree_com=jnp.zeros((sys.nbody, 3), dt),
        qfrc_actuator=jnp.zeros(sys.nv, dt),
    )


def forward(sys: S.System, state: S.State, ctrl: jnp.ndarray) -> ForwardOut:
    qpos, qvel = state.qpos, state.qvel
    kin = kinematics.kinematics(sys, qpos)
    vel = kinematics.com_vel(sys, kin, qvel)

    M = dynamics.crb(sys, kin)

    bias = dynamics.rne_bias(sys, kin, vel, qvel)
    act = dynamics.actuation(sys, qpos, qvel, ctrl)
    qfrc_passive = dynamics.passive(sys, qvel)
    qfrc_smooth = act.qfrc_actuator + qfrc_passive - bias

    # Mass-matrix solves: block-arrow factorization when the kinematic tree
    # is free-base + independent legs (both reference models), dense
    # Cholesky otherwise.  Exact algebra either way.
    lay = arrow.layout(sys)
    if lay is not None:
        fac = arrow.factor(lay, M)
        M_chol = None
        qacc_smooth = arrow.solve_vec(lay, fac, qfrc_smooth)
    else:
        fac = None
        M_chol = linalg.chol(M)
        qacc_smooth = jax.scipy.linalg.cho_solve((M_chol, True), qfrc_smooth)

    con = collision.find_contacts(sys, kin)
    pair = None
    if sys.max_pair_contacts > 0 and len(sys.cpair_a) > 0:
        pair = collision.find_pair_contacts(sys, kin, con)
    # M⁻¹ is never formed here: the leg-sparse PGS works from the arrow
    # factor directly, and the other solver paths build it on demand
    import os as _os

    _ws = (None if _os.environ.get("NIGHTMARE_NO_WARMSTART")
           else state.qacc_warmstart)
    sol = solver.solve_contacts(
        sys, con, qpos, qvel, M_chol, qacc_smooth, pair=pair, M=M,
        lay=lay, fac=fac, warmstart=_ws,
    )

    # touch sensors: per-contact normal force = Σ pyramid facet forces
    sensordata = sys.sensor_cpoint_matrix @ sol.nforce

    return ForwardOut(
        kin, vel, M, M_chol, qfrc_smooth, qacc_smooth, con, sol, act,
        sensordata,
    )


def _integrate_pos(sys: S.System, qpos: jnp.ndarray, qvel: jnp.ndarray, dt):
    """mj_integratePos: joint-type-aware position update."""
    out = qpos
    for j in range(sys.njnt):
        qadr, dadr = sys.jnt_qposadr[j], sys.jnt_dofadr[j]
        jt = sys.jnt_type[j]
        if jt == S.FREE:
            out = out.at[qadr : qadr + 3].add(dt * qvel[dadr : dadr + 3])
            q = Q.integrate(
                qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
            )
            out = out.at[qadr + 3 : qadr + 7].set(q)
        else:
            out = out.at[qadr].add(dt * qvel[dadr])
    return out


def step(sys: S.System, state: S.State, ctrl: jnp.ndarray, n_steps: int = 1) -> S.State:
    """Advance physics by ``n_steps`` timesteps with constant ctrl
    (the decimation loop of envs/nightmare_v3_env.py:200)."""

    def one(state, _):
        fwd = forward(sys, state, ctrl)
        dt = sys.timestep

        lay = arrow.layout(sys)

        def _spd_solve(A, rhs):
            if lay is not None:
                return arrow.solve_vec(lay, arrow.factor(lay, A), rhs)
            return jax.scipy.linalg.cho_solve((linalg.chol(A), True), rhs)

        if sys.integrator == S.IMPLICITFAST:
            # (M - h·∂f/∂v)·qacc = qfrc_smooth + qfrc_constraint, where the
            # velocity derivative has actuator (gear²·b2) and damping terms
            deriv = fwd.act.vel_deriv - sys.dof_damping  # diagonal of ∂f/∂v
            Mhat = fwd.M - dt * jnp.diag(deriv)
            qacc = _spd_solve(
                Mhat, fwd.qfrc_smooth + fwd.sol.qfrc_constraint
            )
            qvel = state.qvel + dt * qacc
        elif sys.eulerdamp and bool(np.any(np.asarray(sys.dof_damping) > 0)):
            # mj_Euler with implicit joint damping:
            # (M + h·diag(B)) v⁺ = M v + h·qfrc_total
            MhB = fwd.M + dt * jnp.diag(sys.dof_damping)
            rhs = fwd.M @ state.qvel + dt * (
                fwd.qfrc_smooth + fwd.sol.qfrc_constraint
            )
            qvel = _spd_solve(MhB, rhs)
        else:
            qvel = state.qvel + dt * fwd.sol.qacc
        qpos = _integrate_pos(sys, state.qpos, qvel, dt)

        # mj_checkPos/mj_checkVel/mj_checkAcc parity: values beyond
        # mjMAXVAL (1e10) or non-finite trigger an automatic reset to the
        # reference pose (MuJoCo's mju_warning + mj_resetData path).
        # Divergence is reachable in extreme scenarios (e.g. actuators
        # driven far past joint limits at high velocity — the bang-bang
        # limit oscillation is chaotic and can run away); without this
        # guard a single runaway frame poisons the whole lockstep batch
        # member with NaNs.
        MAXVAL = 1e10
        bad = ~(
            jnp.all(jnp.isfinite(qpos)) & jnp.all(jnp.isfinite(qvel))
            & (jnp.max(jnp.abs(qpos)) < MAXVAL)
            & (jnp.max(jnp.abs(qvel)) < MAXVAL)
        )
        qpos = jnp.where(bad, sys.qpos0.astype(qpos.dtype), qpos)
        qvel = jnp.where(bad, jnp.zeros_like(qvel), qvel)

        new = state.replace(
            qpos=qpos,
            qvel=qvel,
            qacc_warmstart=jnp.where(
                bad, jnp.zeros_like(fwd.sol.qacc), fwd.sol.qacc
            ),
            sensordata=fwd.sensordata,
            xpos=fwd.kin.xpos,
            xquat=fwd.kin.xquat,
            xipos=fwd.kin.xipos,
            cvel=fwd.vel.cvel,
            subtree_com=fwd.kin.subtree_com,
            qfrc_actuator=fwd.act.qfrc_actuator,
        )
        return new, None

    if n_steps == 1:
        return one(state, None)[0]
    state, _ = jax.lax.scan(one, state, None, length=n_steps)
    return state
