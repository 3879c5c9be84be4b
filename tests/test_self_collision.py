"""Body-body (tibia↔tibia) self-collision: pairs push apart when forced to
overlap; inactive when separated."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.physics import loader, pipeline, kinematics, collision


@pytest.fixture(scope="module")
def sys():
    return loader.load_system("nightmare_v3")


def test_pairs_exist_and_are_cross_leg(sys):
    assert len(sys.cpair_a) == 375  # 15 tibia pairs x 5x5 support points
    ba = np.asarray(sys.cpoint_bodyid)[np.asarray(sys.cpair_a)]
    bb = np.asarray(sys.cpoint_bodyid)[np.asarray(sys.cpair_b)]
    assert (ba != bb).all()


def test_separated_legs_no_pair_force(sys):
    st = pipeline.make_state(sys)
    kin = kinematics.kinematics(sys, st.qpos)
    con = collision.find_contacts(sys, kin)
    pc = collision.find_pair_contacts(sys, kin, con)
    assert not bool(np.asarray(pc.active).any())  # default pose: legs apart


def test_pair_geometry(sys):
    """Pair distance/normal agree with a manual computation."""
    st = pipeline.make_state(sys)
    kin = kinematics.kinematics(sys, st.qpos)
    con = collision.find_contacts(sys, kin)
    pc = collision.find_pair_contacts(sys, kin, con)
    centers = np.asarray(con.centers)
    r = np.asarray(sys.cpoint_radius)
    a, b = np.asarray(pc.a), np.asarray(pc.b)
    manual = np.linalg.norm(centers[b] - centers[a], axis=1) - r[a] - r[b]
    np.testing.assert_allclose(np.asarray(pc.dist), manual, atol=1e-6)
    n = np.asarray(pc.normal)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)


def test_overlapping_pairs_generate_separating_force(sys):
    """Inflate point radii so neighboring legs 'overlap' at the default pose;
    the pair rows must produce forces that push the pair apart."""
    import dataclasses

    big = dataclasses.replace(
        sys, cpoint_radius=jnp.full(sys.ncp, 0.06, jnp.float64)
    )
    st = pipeline.make_state(big)
    qpos = np.asarray(st.qpos).copy()
    qpos[2] = 0.6  # airborne: only pair contacts are active
    st = st.replace(qpos=jnp.array(qpos, st.qpos.dtype))
    kin = kinematics.kinematics(big, st.qpos)
    con = collision.find_contacts(big, kin)
    pc = collision.find_pair_contacts(big, kin, con)
    assert bool(np.asarray(pc.active).any()), np.asarray(pc.dist)

    from nightmare_rl_tpu.physics import dynamics, solver

    M = dynamics.crb(big, kin)
    L = jnp.linalg.cholesky(M)
    vel = kinematics.com_vel(big, kin, jnp.zeros(big.nv))
    bias = dynamics.rne_bias(big, kin, vel, jnp.zeros(big.nv))
    qacc_smooth = -jnp.linalg.solve(M, bias)
    sol = solver.solve_contacts(
        big, con, st.qpos, jnp.zeros(big.nv), L, qacc_smooth, pair=pc
    )
    # separating relative acceleration along each active pair normal ≥ 0
    dq = np.asarray(sol.qacc - qacc_smooth)
    jn = np.einsum("knd,kd->kn", np.asarray(pc.jac), np.asarray(pc.normal))
    rel_acc = jn @ dq
    active = np.asarray(pc.active)
    assert (rel_acc[active] > -1e-6).all(), rel_acc
