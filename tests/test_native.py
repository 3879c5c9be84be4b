"""Native mmap ring-buffer trajectory log: build, roundtrip, wraparound,
crash-safe reopen."""

import numpy as np
import pytest

from nightmare_rl_tpu.utils.binlog import TrajectoryLog


def test_roundtrip(tmp_path):
    log = TrajectoryLog(str(tmp_path / "a.ring"), nq=25, nv=24, capacity=128)
    rng = np.random.default_rng(0)
    qs, vs = rng.normal(size=(50, 25)), rng.normal(size=(50, 24))
    for k in range(50):
        log.append(k * 0.016, qs[k], vs[k])
    t, q, v = log.read()
    assert log.frames_written == 50
    np.testing.assert_allclose(t, np.arange(50) * 0.016, rtol=1e-6)
    np.testing.assert_allclose(q, qs.astype(np.float32))
    np.testing.assert_allclose(v, vs.astype(np.float32))


def test_wraparound(tmp_path):
    log = TrajectoryLog(str(tmp_path / "b.ring"), nq=2, nv=1, capacity=8)
    for k in range(20):
        log.append(float(k), np.array([k, k]), np.array([k]))
    t, q, v = log.read()
    assert log.frames_written == 20
    assert len(t) == 8                       # ring retains the last 8
    np.testing.assert_allclose(t, np.arange(12, 20, dtype=np.float32))


def test_reopen(tmp_path):
    path = str(tmp_path / "c.ring")
    log = TrajectoryLog(path, nq=3, nv=3, capacity=16)
    log.append(1.0, np.ones(3), np.zeros(3))
    log.flush()
    del log
    # reopen reads geometry from the header
    log2 = TrajectoryLog(path, nq=3, nv=3, capacity=16)
    t, q, v = log2.read()
    assert log2.frames_written == 1
    assert t[0] == 1.0


def test_frame_size_mismatch(tmp_path):
    from nightmare_rl_tpu.native import get_ringlog

    rl = get_ringlog()
    ring = rl.RingLog(str(tmp_path / "d.ring"), frame_size=16, capacity=4)
    with pytest.raises(ValueError):
        ring.append(b"short")
