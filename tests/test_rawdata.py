"""Reference recorded-data format readers/writers (analysis/rawdata.py)."""

import os

import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import rawdata

_BIN = "/root/reference/Exp_Raw_Data/body-center-2021-07-23-09-19-15.bin"
_PARAM = "/root/reference/Exp_Raw_Data/Param-2021-07-23-09-19-15.txt"


@pytest.mark.skipif(not os.path.exists(_BIN), reason="reference data absent")
def test_body_center_stream_parses():
    rb = rawdata.RobotBodyInfo(_BIN, _PARAM)
    assert rb.data.shape == (10000, 13)
    assert rb.episodes().shape == (1, 10000, 13)
    # physically plausible recorded run: unit quaternions, stand-height z
    np.testing.assert_allclose(np.linalg.norm(rb.quat, axis=1), 1.0, atol=1e-3)
    assert 0.15 < rb.pos[:, 2].mean() < 0.45
    # the V_Max=5 sweep actually runs ~5 m/s (the parity anchor for our sim)
    vx = rb.vel_body[5000:, 0].mean()
    assert 4.5 < vx < 5.5


def test_info_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    T = 16
    gc = rng.normal(size=(T, 19))
    gv = rng.normal(size=(T, 18))
    tau = rng.normal(size=(T, 12)) * 10
    contact = (rng.random((T, 4)) > 0.5).astype(float)
    p = str(tmp_path / "info.csv")
    rawdata.dump_robot_info(p, gc, gv, tau, contact)
    ri = rawdata.RobotInfo(p)
    np.testing.assert_allclose(ri.tau, tau, atol=1e-10)
    np.testing.assert_allclose(ri.z, gc[:, 2], atol=1e-12)
    np.testing.assert_allclose(ri.q, gc[:, 7:19], atol=1e-12)
    np.testing.assert_allclose(ri.dq, gv[:, 6:18], atol=1e-12)
    np.testing.assert_allclose(ri.contact, contact, atol=1e-12)


def test_info_wildcat_mirrors_vx(tmp_path):
    T = 4
    gc = np.zeros((T, 19))
    gc[:, 3] = 1.0  # identity quat
    gv = np.zeros((T, 18))
    gv[:, 0] = 2.0
    p = str(tmp_path / "w.csv")
    rawdata.dump_robot_info(p, gc, gv, np.zeros((T, 12)), np.zeros((T, 4)))
    ri = rawdata.RobotInfo(p, is_wildcat=True)
    np.testing.assert_allclose(ri.vel[:, 0], -2.0)
