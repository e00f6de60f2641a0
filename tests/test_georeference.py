"""filters.georeference analog vs an independent numpy model of
GeoreferenceFilter.cpp processOne (forward path, corrected z
interpolation)."""

import math

import numpy as np
import pytest

from pdal_spark.operators import transform as ops_transform


def _np_georef(pt_time, p, traj, scan2imu=None, ned=True, off=0.0):
    """traj rows: (time, lon_rad, lat_rad, z, roll, pitch, az, wan)."""
    t = pt_time + off
    ts = [r[0] for r in traj]
    # bracket: first sample >= t, must have a predecessor
    hi = None
    for i, tv in enumerate(ts):
        if tv >= t:
            hi = i
            break
    if hi is None or hi == 0:
        return None
    r1, r2 = traj[hi - 1], traj[hi]
    f = (t - r1[0]) / (r2[0] - r1[0])

    def ang(a1, a2):
        return math.atan2(f * math.sin(a2) + (1 - f) * math.sin(a1),
                          f * math.cos(a2) + (1 - f) * math.cos(a1))

    lon = ang(r1[1], r2[1]); lat = ang(r1[2], r2[2])
    h = r1[3] * (1 - f) + r2[3] * f
    roll = ang(r1[4], r2[4]); pitch = ang(r1[5], r2[5])
    yaw = ang(r1[6], r2[6]) - ang(r1[7], r2[7])

    def rz(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    def ry(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])

    def rx(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])

    q = np.asarray(p, dtype=float)
    if scan2imu is not None:
        m = np.asarray(scan2imu, dtype=float).reshape(4, 4)
        q = m[:3, :3] @ q + m[:3, 3]
    v = rz(yaw) @ ry(pitch) @ rx(roll) @ q
    enu = np.array([v[1], v[0], -v[2]]) if ned else v
    a, fl = 6378137.0, 1 / 298.257223563
    e2 = fl * (2 - fl)
    N = a / math.sqrt(1 - e2 * math.sin(lat) ** 2)
    O = np.array([(N + h) * math.cos(lat) * math.cos(lon),
                  (N + h) * math.cos(lat) * math.sin(lon),
                  (N * (1 - e2) + h) * math.sin(lat)])
    R = np.array([
        [-math.sin(lon), -math.sin(lat) * math.cos(lon),
         math.cos(lat) * math.cos(lon)],
        [math.cos(lon), -math.sin(lat) * math.sin(lon),
         math.cos(lat) * math.sin(lon)],
        [0.0, math.cos(lat), math.sin(lat)]])
    return O + R @ enu


_TRAJ = [
    # time, lon_rad, lat_rad, z, roll, pitch, azimuth, wander
    (0.0, 0.0420, 0.8500, 100.0, 0.010, -0.020, 1.50, 0.001),
    (10.0, 0.0421, 0.8501, 105.0, 0.015, -0.018, 1.60, 0.002),
    (20.0, 0.0423, 0.8503, 108.0, 0.005, -0.022, 1.70, 0.000),
]


def _traj_df(spark):
    return spark.createDataFrame(
        _TRAJ, ["time", "x", "y", "z", "roll", "pitch", "azimuth",
                "wander_angle"])


def test_georeference_matches_numpy_model(spark):
    pts = [(1, 2.5, 1.0, 2.0, -0.5), (2, 12.5, -3.0, 0.5, 1.5),
           (3, 19.0, 0.0, 0.0, 0.0)]
    df = spark.createDataFrame(
        pts, ["pid", "gps_time", "x", "y", "z"])
    out = {r.pid: (r.x, r.y, r.z) for r in ops_transform.georeference(
        df, _traj_df(spark)).collect()}
    for pid, t, px, py, pz in pts:
        exp = _np_georef(t, (px, py, pz), _TRAJ)
        got = np.array(out[pid])
        assert np.abs(got - exp).max() < 1e-6, (pid, got, exp)


def test_georeference_drops_out_of_range_and_enu_scan2imu(spark):
    m = [0.0, -1.0, 0.0, 0.5,
         1.0, 0.0, 0.0, -0.25,
         0.0, 0.0, 1.0, 2.0,
         0.0, 0.0, 0.0, 1.0]
    pts = [(1, 5.0, 1.0, 2.0, 3.0),
           (2, -1.0, 1.0, 1.0, 1.0),   # before trajectory -> dropped
           (3, -0.5, 1.0, 1.0, 1.0),   # t+off == t_first -> dropped
           (4, 25.0, 1.0, 1.0, 1.0)]   # after trajectory -> dropped
    df = spark.createDataFrame(
        pts, ["pid", "gps_time", "x", "y", "z"])
    out = {r.pid: (r.x, r.y, r.z) for r in ops_transform.georeference(
        df, _traj_df(spark), scan2imu=m, coordinate_system="ENU",
        time_offset=0.5).collect()}
    assert set(out) == {1}
    exp = _np_georef(5.0, (1.0, 2.0, 3.0), _TRAJ, scan2imu=m,
                     ned=False, off=0.5)
    assert np.abs(np.array(out[1]) - exp).max() < 1e-6


def test_georeference_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 5.0, 0.0, 0.0, 0.0)],
                               ["pid", "gps_time", "x", "y", "z"])
    with pytest.raises(ValueError, match="coordinate_system"):
        ops_transform.georeference(df, _traj_df(spark),
                                   coordinate_system="XYZ")
    with pytest.raises(ValueError, match="scan2imu"):
        ops_transform.georeference(df, _traj_df(spark),
                                   scan2imu=[1.0] * 9)
