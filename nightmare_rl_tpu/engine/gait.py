"""Classical hexapod gait engine — functional JAX re-derivation of nikengine.

Capabilities mirrored from the reference (nikengine/engine.py):

- 7-state FSM: Idle, AdjustGetUp, GetUp, Sit, AdjustSit, Stand, Walk
  (engine.py:414-638) as a lax.switch over an integer state id;
- tripod/ripple/wave gait tables (engine.py:215-225);
- walk-state leg keep-out optimization: a 10-step reduction-factor line
  search over the 2-D min-distance between leg segments
  (engine.py:554-596), vectorized over candidate factors and leg pairs;
- stance translate/rotate + cubic-Bezier swing interpolation
  (engine.py:606-622, modules/bezier.py);
- per-leg analytic 3-DoF IK with reachability clamping (engine.py:679-701);
- servo/URDF joint offsets (engine.py:123,201,715).

Unlike the reference's stateful singleton, the engine here is a pure function
``update(cfg, state, t, lin_speed, ang_speed, cmd_state, cmd_mode) ->
(state, angles)`` over an explicit EngineState pytree — trivially vmappable
across envs and usable inside jitted rollouts (the reference instantiated one
Python EngineNode per env and stepped them in a list comprehension,
envs/nightmare_v3_env.py:142,186).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# FSM state ids
IDLE, ADJ_GET_UP, GET_UP, SIT, ADJ_SIT, STAND, WALK = range(7)
# command states / modes
CMD_IDLE, CMD_AWAKE = 0, 1
MODE_STAND, MODE_WALK = 0, 1

PI = math.pi


def _default_legs():
    # geometry from engine.py:39-50,148-197
    STAND_MID_LEG_X = 26.0e-2
    STAND_OUT_LEG_X = 20.0e-2
    STAND_MID_LEG_Y = 0.0e-2
    STAND_OUT_LEG_Y = 20.0e-2
    BODY_LENGTH = 15.5e-2
    BODY_MID_WIDTH = 18.6e-2
    BODY_OUT_WIDTH = 13.7e-2
    STAND_HEIGHT = 10.0e-2
    offsets = np.array(
        [
            [BODY_OUT_WIDTH / 2, BODY_LENGTH / 2, 0],
            [BODY_MID_WIDTH / 2, 0, 0],
            [BODY_OUT_WIDTH / 2, -BODY_LENGTH / 2, 0],
            [-BODY_OUT_WIDTH / 2, -BODY_LENGTH / 2, 0],
            [-BODY_MID_WIDTH / 2, 0, 0],
            [-BODY_OUT_WIDTH / 2, BODY_LENGTH / 2, 0],
        ]
    )
    default_pose = np.array(
        [
            [STAND_OUT_LEG_X, STAND_OUT_LEG_Y, -STAND_HEIGHT],
            [STAND_MID_LEG_X, STAND_MID_LEG_Y, -STAND_HEIGHT],
            [STAND_OUT_LEG_X, -STAND_OUT_LEG_Y, -STAND_HEIGHT],
            [-STAND_OUT_LEG_X, -STAND_OUT_LEG_Y, -STAND_HEIGHT],
            [-STAND_MID_LEG_X, STAND_MID_LEG_Y, -STAND_HEIGHT],
            [-STAND_OUT_LEG_X, STAND_OUT_LEG_Y, -STAND_HEIGHT],
        ]
    )
    servo_offset = np.array(
        [PI / 4, 0, 0, 0, 0, 0, -PI / 4, 0, 0, PI / 4, 0, 0, 0, 0, 0,
         -PI / 4, 0, 0]
    )
    # sides: legs 1-3 RIGHT(1), 4-6 LEFT(0); rel convert (engine.py:203)
    rel_convert = np.array(
        [[1, 1, 1]] * 3 + [[-1, -1, 1]] * 3, dtype=np.float64
    )
    return offsets, default_pose, servo_offset, rel_convert


GAITS = {
    "tripod": np.array(
        [[1, 0, 1, 0, 1, 0], [0, 1, 0, 1, 0, 1]], dtype=bool
    ),
    "ripple": np.array(
        [
            [1, 0, 0, 0, 1, 0],
            [0, 1, 0, 1, 0, 0],
            [0, 0, 1, 0, 0, 1],
        ],
        dtype=bool,
    ),
    "wave": np.eye(6, dtype=bool),
}


@struct.dataclass
class EngineCfg:
    # constants from engine.py:46-84, all static-friendly array leaves
    leg_dim: jnp.ndarray          # (3,) coxa, femur, tibia lengths
    pose_offset: jnp.ndarray      # (6, 3)
    default_pose: jnp.ndarray     # (6, 3)
    sit_pose: jnp.ndarray         # (6, 3)
    servo_offset: jnp.ndarray     # (18,)
    urdf_offset: jnp.ndarray      # (18,)
    rel_convert: jnp.ndarray      # (6, 3)
    gait: jnp.ndarray             # (n_steps, 6) bool
    keepout: float = struct.field(pytree_node=False, default=0.03)
    step_time: float = struct.field(pytree_node=False, default=1.0)
    step_height: float = struct.field(pytree_node=False, default=5.0e-2)
    engine_fps: float = struct.field(pytree_node=False, default=51.0)
    time_get_up_adj: float = struct.field(pytree_node=False, default=1.0)
    time_get_up: float = struct.field(pytree_node=False, default=2.5)
    time_sit: float = struct.field(pytree_node=False, default=2.5)


def make_cfg(gait: str = "tripod", engine_fps: float = 51.0) -> EngineCfg:
    offsets, default_pose, servo_offset, rel_convert = _default_legs()
    urdf = np.array([0, -1.2734, -0.7854] * 6)
    sit = default_pose.copy()
    sit[:, 2] = 0.0
    return EngineCfg(
        leg_dim=jnp.array([6.5e-2, 13.0e-2, 17.0e-2]),
        pose_offset=jnp.array(offsets),
        default_pose=jnp.array(default_pose),
        sit_pose=jnp.array(sit),
        servo_offset=jnp.array(servo_offset),
        urdf_offset=jnp.array(urdf),
        rel_convert=jnp.array(rel_convert),
        gait=jnp.array(GAITS[gait]),
        engine_fps=engine_fps,
    )


@struct.dataclass
class EngineState:
    fsm: jnp.ndarray              # () int32 state id
    state_start: jnp.ndarray      # () f    time the current fsm state began
    pose: jnp.ndarray             # (6, 3)  last commanded pose
    adj_start_pose: jnp.ndarray   # (6, 3)  AdjustGetUp interpolation start
    gait_step: jnp.ndarray        # () int32
    gait_phase: jnp.ndarray       # () f    gait_step_state in [0, 1]
    last_step_pose: jnp.ndarray   # (6, 3)


def init_state(cfg: EngineCfg) -> EngineState:
    return EngineState(
        fsm=jnp.zeros((), jnp.int32),
        state_start=jnp.zeros(()),
        pose=cfg.default_pose,
        adj_start_pose=cfg.default_pose,
        gait_step=jnp.zeros((), jnp.int32),
        gait_phase=jnp.zeros(()),
        last_step_pose=cfg.default_pose,
    )


# ---------------------------------------------------------------------------
# geometry helpers (modules/math.py re-derivations)
# ---------------------------------------------------------------------------


def _rotvec_apply(pose, rotvec):
    """Apply a rotation-vector rotation to each (6,3) row
    (scipy R.from_rotvec semantics, modules/math.py:29-44)."""
    angle = jnp.linalg.norm(rotvec)
    axis = rotvec / jnp.maximum(angle, 1e-12)
    c, s = jnp.cos(angle), jnp.sin(angle)
    # Rodrigues: v' = v·cosθ + (k×v)·sinθ + k·(k·v)·(1−cosθ)
    dot = jnp.sum(pose * axis, axis=-1, keepdims=True)
    return (
        pose * c
        + jnp.cross(jnp.broadcast_to(axis, pose.shape), pose) * s
        + axis * dot * (1 - c)
    )


def _masked(new, old, mask):
    return jnp.where(mask[:, None], new, old)


def _asym_sigmoid(v):
    return 1.0 / (1.0 + jnp.exp(-13.0 * (v - 0.5)))


def _bezier4(t, p0, p1, p2, p3):
    u = 1.0 - t
    return (
        u**3 * p0 + 3 * u**2 * t * p1 + 3 * u * t**2 * p2 + t**3 * p3
    )


def _seg_point_dist(p1, p2, p):
    """Point-to-segment distance in 2D, batched on leading dims."""
    d = p2 - p1
    denom = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
    t = jnp.clip(jnp.sum((p - p1) * d, axis=-1) / denom, 0.0, 1.0)
    proj = p1 + t[..., None] * d
    return jnp.linalg.norm(p - proj, axis=-1)


def _ccw(a, b, c):
    return (c[..., 1] - a[..., 1]) * (b[..., 0] - a[..., 0]) > (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])


def _segments_intersect(a, b, c, d):
    return (_ccw(a, c, d) != _ccw(b, c, d)) & (_ccw(a, b, c) != _ccw(a, b, d))


def _seg_seg_dist(p1a, p1b, p2a, p2b):
    inter = _segments_intersect(p1a, p1b, p2a, p2b)
    d = jnp.minimum(
        jnp.minimum(_seg_point_dist(p1a, p1b, p2a), _seg_point_dist(p1a, p1b, p2b)),
        jnp.minimum(_seg_point_dist(p2a, p2b, p1a), _seg_point_dist(p2a, p2b, p1b)),
    )
    return jnp.where(inter, 0.0, d)


# ---------------------------------------------------------------------------
# IK (engine.py:679-701)
# ---------------------------------------------------------------------------


def relative_ik(rel_pos, leg_dim):
    x, y, z = rel_pos[0], rel_pos[1], rel_pos[2]
    CX, FM, TB = leg_dim[0], leg_dim[1], leg_dim[2]
    eps = 1e-6

    r_xy = jnp.sqrt(x**2 + y**2)
    coxa_tip = jnp.array([x, y, 0.0]) / jnp.maximum(r_xy, 1e-12) * CX
    delta = rel_pos - coxa_tip
    dist = jnp.linalg.norm(delta)
    director = delta / jnp.maximum(dist, 1e-12)
    # reachability clamp (too far / too close)
    clamped = jnp.clip(dist, jnp.abs(FM - TB) + eps, FM + TB - eps)
    pos = jnp.where(
        (dist > FM + TB) | (dist < jnp.abs(FM - TB)),
        coxa_tip + clamped * director,
        rel_pos,
    )
    x, y, z = pos[0], pos[1], pos[2]

    d1 = jnp.sqrt(y**2 + x**2) - CX
    d = jnp.sqrt(z**2 + d1**2)
    alpha = -jnp.arctan2(y, x)
    nz = jnp.where(jnp.abs(z) < eps, eps, z)
    acos1 = jnp.arccos(
        jnp.clip((z**2 + d**2 - d1**2) / (2.0 * (-nz) * jnp.maximum(d, 1e-12)), -1.0, 1.0)
    )
    acos2 = jnp.arccos(
        jnp.clip((FM**2 + d**2 - TB**2) / (2.0 * FM * jnp.maximum(d, 1e-12)), -1.0, 1.0)
    )
    beta = acos1 + acos2
    gamma = -jnp.arccos(
        jnp.clip((FM**2 + TB**2 - d**2) / (2.0 * FM * TB), -1.0, 1.0)
    ) + 2.0 * PI
    return jnp.array([alpha, beta - PI / 2.0, gamma - 1.5 * PI])


def pose_to_angles(cfg: EngineCfg, pose: jnp.ndarray) -> jnp.ndarray:
    """set_hardware_pose (engine.py:703-708) + URDF offsets (:715)."""
    rel = (pose - cfg.pose_offset) * cfg.rel_convert
    angles = jax.vmap(lambda r: relative_ik(r, cfg.leg_dim))(rel).reshape(-1)
    return angles + cfg.servo_offset + cfg.urdf_offset


# ---------------------------------------------------------------------------
# FSM state updates; each returns (next_fsm, next_start, pose, walk updates)
# ---------------------------------------------------------------------------


def _walk_predict_cost(cfg, pose, gait_step_mask, phase, walk_trasl, walk_rot,
                       n_gait_steps, red):
    """cost(x) from engine.py:554-583: predicted min leg distance deficit."""
    ground = ~gait_step_mask
    tmf = red * 2.0 * n_gait_steps * (1.0 - phase)
    moved = _masked(
        _rotvec_apply(pose + (-walk_trasl) * tmf, -walk_rot * tmf),
        pose, ground,
    )
    tmf_step = red * cfg.step_time
    target = _rotvec_apply(cfg.default_pose + walk_trasl * tmf_step,
                           walk_rot * tmf_step)
    predicted = _masked(target, moved, gait_step_mask)

    tips = predicted[:, :2]
    roots = cfg.pose_offset[:, :2]
    ii, jj = jnp.meshgrid(jnp.arange(6), jnp.arange(6), indexing="ij")
    mask = ii != jj
    d = _seg_seg_dist(tips[ii], roots[ii], tips[jj], roots[jj])
    d = jnp.where(mask, d, jnp.inf)
    deficit = cfg.keepout - jnp.min(d)
    return jnp.maximum(deficit, 0.0)


def _walk(cfg: EngineCfg, es: EngineState, lin_speed, ang_speed):
    n_gait = cfg.gait.shape[0]
    walk_trasl = jnp.array([0.0, 1.0, 0.0]) * lin_speed
    walk_rot = jnp.array([0.0, 0.0, 1.0]) * ang_speed
    gait_mask = cfg.gait[es.gait_step]

    # reduction-factor line search (engine.py:586-596): red starts at 1 and
    # decrements by 0.1 until cost < 0.01; falls through to 0.0
    reds = 1.0 - 0.1 * jnp.arange(10, dtype=es.pose.dtype)
    costs = jax.vmap(
        lambda r: _walk_predict_cost(
            cfg, es.pose, gait_mask, es.gait_phase, walk_trasl, walk_rot,
            n_gait, r,
        )
    )(reds)
    ok = costs < 0.01
    red = jnp.where(jnp.any(ok), reds[jnp.argmax(ok)], 0.0)

    # stance legs: translate/rotate opposite the commanded motion (:606-609)
    ground = ~gait_mask
    tmf = red * (1.0 / cfg.engine_fps) * 2.0 * n_gait
    temp = _masked(
        _rotvec_apply(es.pose + (-walk_trasl) * tmf, -walk_rot * tmf),
        es.pose, ground,
    )

    # swing legs: cubic Bezier toward the predicted target (:612-622)
    tmf_step = red * cfg.step_time
    target = _rotvec_apply(cfg.default_pose + walk_trasl * tmf_step,
                           walk_rot * tmf_step)
    lift = jnp.array([0.0, 0.0, cfg.step_height])
    sw = _bezier4(
        es.gait_phase,
        es.last_step_pose,
        es.last_step_pose + lift,
        target + lift,
        target,
    )
    new_pose = _masked(sw, temp, gait_mask)

    # phase advance (:625-630)
    phase = es.gait_phase + n_gait / (cfg.step_time * cfg.engine_fps)
    rollover = phase > 1.0
    gait_step = jnp.where(rollover, (es.gait_step + 1) % n_gait, es.gait_step)
    # on rollover the reference snapshots the *incoming* pose (pre-update)
    last_step_pose = jnp.where(rollover, es.pose, es.last_step_pose)
    phase = jnp.where(rollover, 0.0, phase)
    return new_pose, gait_step, phase, last_step_pose


def update(cfg: EngineCfg, es: EngineState, t, lin_speed, ang_speed,
           cmd_state: jnp.ndarray, cmd_mode: jnp.ndarray
           ) -> Tuple[EngineState, jnp.ndarray]:
    """One engine tick (EngineNode.update, engine.py:710-715).

    cmd_state: CMD_IDLE | CMD_AWAKE;  cmd_mode: MODE_STAND | MODE_WALK.
    Returns (new_state, joint angles (18,))."""
    task_t = t - es.state_start

    def idle(es):
        nxt = jnp.where(cmd_state == CMD_AWAKE, ADJ_GET_UP, IDLE)
        return nxt, es.pose, es

    def adj_get_up(es):
        adv = task_t / cfg.time_get_up_adj
        pose = jnp.where(
            adv < 1.0,
            es.adj_start_pose + (cfg.sit_pose - es.adj_start_pose)
            * jnp.minimum(adv, 1.0),
            cfg.sit_pose,
        )
        nxt = jnp.where(adv >= 2.0, GET_UP, ADJ_GET_UP)
        return nxt, pose, es

    def get_up(es):
        adv = task_t / cfg.time_get_up
        pose = jnp.where(
            adv < 1.0,
            cfg.sit_pose + (cfg.default_pose - cfg.sit_pose)
            * _asym_sigmoid(jnp.minimum(adv, 1.0)),
            cfg.default_pose,
        )
        done = adv > 1.0
        nxt = jnp.where(
            done & (cmd_state == CMD_IDLE), ADJ_SIT,
            jnp.where(
                done & (cmd_mode == MODE_STAND), STAND,
                jnp.where(done, WALK, GET_UP),
            ),
        )
        return nxt, pose, es

    def sit(es):
        adv = task_t / cfg.time_sit
        pose = jnp.where(
            adv < 1.0,
            cfg.default_pose + (cfg.sit_pose - cfg.default_pose)
            * _asym_sigmoid(jnp.minimum(adv, 1.0)),
            cfg.sit_pose,
        )
        nxt = jnp.where(adv >= 1.0, IDLE, SIT)
        return nxt, pose, es

    def adj_sit(es):
        return SIT, cfg.default_pose, es

    def stand(es):
        walking = (cmd_state == CMD_AWAKE) & (cmd_mode == MODE_WALK)
        idle_cmd = cmd_state == CMD_IDLE
        nxt = jnp.where(walking, WALK, jnp.where(idle_cmd, ADJ_SIT, STAND))
        return nxt, cfg.default_pose, es

    def walk(es):
        pose, gstep, phase, lsp = _walk(cfg, es, lin_speed, ang_speed)
        keep_walking = ((cmd_state == CMD_AWAKE) & (cmd_mode == MODE_WALK)) | (
            es.gait_phase != 0.0
        )
        nxt = jnp.where(
            keep_walking, WALK,
            jnp.where(cmd_state == CMD_IDLE, IDLE, STAND),
        )
        pose = jnp.where(keep_walking, pose, es.pose)
        es = es.replace(
            gait_step=jnp.where(keep_walking, gstep, 0),
            gait_phase=jnp.where(keep_walking, phase, 0.0),
            last_step_pose=jnp.where(keep_walking, lsp, es.last_step_pose),
        )
        return nxt, pose, es

    branches = [idle, adj_get_up, get_up, sit, adj_sit, stand, walk]
    nxt, pose, es = jax.lax.switch(es.fsm, branches, es)
    nxt = nxt.astype(jnp.int32)

    transitioned = nxt != es.fsm
    es = es.replace(
        fsm=nxt,
        state_start=jnp.where(transitioned, t, es.state_start),
        # AdjustGetUp snapshots the pose at entry (engine.py:431-433)
        adj_start_pose=jnp.where(
            transitioned & (nxt == ADJ_GET_UP), es.pose, es.adj_start_pose
        ),
        # Walk snapshots last_step_pose at entry (engine.py:539-543)
        last_step_pose=jnp.where(
            transitioned & (nxt == WALK), pose, es.last_step_pose
        ),
        gait_phase=jnp.where(
            transitioned & (nxt == WALK), 0.0, es.gait_phase
        ),
        gait_step=jnp.where(
            transitioned & (nxt == WALK), 0, es.gait_step
        ),
        pose=pose,
    )
    return es, pose_to_angles(cfg, pose)
