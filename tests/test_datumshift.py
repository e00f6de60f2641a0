"""NTv2 datum-shift grids (+proj=hgridshift). Ground truth is
algebraic, writer-independent: bilinear interpolation reproduces a
LINEAR shift field EXACTLY at arbitrary off-node points, so a grid
sampled from dlat = a + b*lat + c*lon must shift any point by the
analytic field value to float32-quantization accuracy. Sign
conventions (NTv2 longitudes positive WEST; forward lon -= dlon)
are pinned by asymmetric single-direction shifts; the inverse is
pinned by forward-inverse identity; densest-subgrid selection by a
parent/child pair with different values.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdal_spark.operators.datumshift import (
    apply_shift_arrays,
    hgridshift,
    read_ntv2,
    write_ntv2,
)


def _linear_grid(tmp_path, a=1.0, b=0.002, c=-0.001,
                 d=-2.0, e=0.0015, f=0.0005):
    """One subgrid over lat 40..41N, lon 105..106W with
    dlat = a + b*lat_s + c*lonw_s, dlon = d + e*lat_s + f*lonw_s
    (arcsec, in grid arcsecond coordinates scaled by 1e-3 to stay
    within float32 exactness)."""
    s_lat, n_lat = 40 * 3600.0, 41 * 3600.0
    e_long, w_long = 105 * 3600.0, 106 * 3600.0
    inc = 360.0  # 0.1 degree
    lats = np.arange(s_lat, n_lat + 1, inc)
    lons = np.arange(e_long, w_long + 1, inc)
    LO, LA = np.meshgrid(lons, lats)

    def fla(la, lo):
        return a + b * (la - s_lat) / 1000 + c * (lo - e_long) / 1000

    def flo(la, lo):
        return d + e * (la - s_lat) / 1000 + f * (lo - e_long) / 1000

    fp = str(tmp_path / "linear.gsb")
    write_ntv2(fp, [{
        "name": "LIN", "s_lat": s_lat, "n_lat": n_lat,
        "e_long": e_long, "w_long": w_long,
        "lat_inc": inc, "long_inc": inc,
        "dlat": fla(LA, LO), "dlon": flo(LA, LO),
    }])
    return fp, fla, flo, (s_lat, e_long)


def test_gsb_round_trip(tmp_path):
    fp, _, _, _ = _linear_grid(tmp_path)
    grids = read_ntv2(fp)
    assert len(grids) == 1
    g = grids[0]
    assert g["name"] == "LIN"
    assert g["dlat"].shape == (11, 11)
    assert g["lat_inc"] == 360.0


def test_bilinear_reproduces_linear_field(tmp_path):
    fp, fla, flo, _ = _linear_grid(tmp_path)
    grids = read_ntv2(fp)
    rng = np.random.default_rng(3)
    # arbitrary interior points, far from nodes
    lat = rng.uniform(40.01, 40.99, 200)
    lon = -rng.uniform(105.01, 105.99, 200)  # east-positive
    lon2, lat2 = apply_shift_arrays(grids, lon, lat)
    want_dlat = fla(lat * 3600.0, -lon * 3600.0)
    want_dlon = flo(lat * 3600.0, -lon * 3600.0)
    np.testing.assert_allclose(
        (lat2 - lat) * 3600.0, want_dlat, atol=2e-4)
    np.testing.assert_allclose(
        (lon - lon2) * 3600.0, want_dlon, atol=2e-4)


def test_sign_conventions(tmp_path):
    # constant +1.5 arcsec dlat, +2.0 arcsec dlon (positive west):
    # latitude must INCREASE, east-positive longitude must DECREASE
    fp = str(tmp_path / "c.gsb")
    write_ntv2(fp, [{
        "name": "C", "s_lat": 0.0, "n_lat": 3600.0,
        "e_long": 0.0, "w_long": 3600.0,
        "lat_inc": 3600.0, "long_inc": 3600.0,
        "dlat": np.full((2, 2), 1.5), "dlon": np.full((2, 2), 2.0),
    }])
    grids = read_ntv2(fp)
    lon = np.array([-0.5])  # 0.5W inside the grid
    lat = np.array([0.5])
    lon2, lat2 = apply_shift_arrays(grids, lon, lat)
    assert lat2[0] == pytest.approx(0.5 + 1.5 / 3600.0, abs=1e-12)
    assert lon2[0] == pytest.approx(-0.5 - 2.0 / 3600.0, abs=1e-12)


def test_outside_grid_passthrough(tmp_path):
    fp, _, _, _ = _linear_grid(tmp_path)
    grids = read_ntv2(fp)
    lon = np.array([10.0, -150.0])
    lat = np.array([70.0, -33.0])
    lon2, lat2 = apply_shift_arrays(grids, lon, lat)
    assert (lon2 == lon).all() and (lat2 == lat).all()


def test_forward_inverse_identity(tmp_path):
    fp, _, _, _ = _linear_grid(tmp_path)
    grids = read_ntv2(fp)
    rng = np.random.default_rng(5)
    lat = rng.uniform(40.05, 40.95, 100)
    lon = -rng.uniform(105.05, 105.95, 100)
    flon, flat = apply_shift_arrays(grids, lon, lat)
    blon, blat = apply_shift_arrays(grids, flon, flat, inverse=True)
    np.testing.assert_allclose(blat, lat, atol=1e-11)
    np.testing.assert_allclose(blon, lon, atol=1e-11)


def test_densest_subgrid_wins(tmp_path):
    # parent says +1", a denser child over the north half says +9"
    fp = str(tmp_path / "pc.gsb")
    write_ntv2(fp, [
        {"name": "PARENT", "s_lat": 0.0, "n_lat": 7200.0,
         "e_long": 0.0, "w_long": 7200.0,
         "lat_inc": 3600.0, "long_inc": 3600.0,
         "dlat": np.full((3, 3), 1.0),
         "dlon": np.zeros((3, 3))},
        {"name": "CHILD", "parent": "PARENT",
         "s_lat": 3600.0, "n_lat": 7200.0,
         "e_long": 0.0, "w_long": 7200.0,
         "lat_inc": 900.0, "long_inc": 900.0,
         "dlat": np.full((5, 9), 9.0),
         "dlon": np.zeros((5, 9))},
    ])
    grids = read_ntv2(fp)
    lon = np.array([-0.5, -0.5])
    lat = np.array([0.5, 1.5])  # south: parent only; north: child
    _, lat2 = apply_shift_arrays(grids, lon, lat)
    assert (lat2[0] - lat[0]) * 3600 == pytest.approx(1.0, abs=1e-9)
    assert (lat2[1] - lat[1]) * 3600 == pytest.approx(9.0, abs=1e-9)


def test_hgridshift_spark_and_projpipeline(spark, tmp_path):
    from pdal_spark.operators.transform import projpipeline

    fp, fla, _, _ = _linear_grid(tmp_path)
    import pandas as pd

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "x": -rng.uniform(105.1, 105.9, 500),
        "y": rng.uniform(40.1, 40.9, 500),
        "id": np.arange(500),
    })
    df = spark.createDataFrame(pdf)
    out = hgridshift(df, fp, lon="x", lat="y") \
        .toPandas().sort_values("id")
    want_dlat = fla(pdf.sort_values("id").y.to_numpy() * 3600.0,
                    -pdf.sort_values("id").x.to_numpy() * 3600.0)
    np.testing.assert_allclose(
        (out.y.to_numpy() - pdf.sort_values("id").y.to_numpy())
        * 3600.0, want_dlat, atol=2e-4)
    # same thing through the projpipeline step grammar
    out2 = projpipeline(
        df, f"+proj=pipeline +step +proj=hgridshift +grids={fp}") \
        .toPandas().sort_values("id")
    np.testing.assert_allclose(out2.y.to_numpy(), out.y.to_numpy())
    np.testing.assert_allclose(out2.x.to_numpy(), out.x.to_numpy())
    # +inv round-trips
    back = projpipeline(
        spark.createDataFrame(out2),
        f"+proj=pipeline +step +proj=hgridshift +grids={fp} +inv") \
        .toPandas().sort_values("id")
    np.testing.assert_allclose(back.y.to_numpy(),
                               pdf.sort_values("id").y.to_numpy(),
                               atol=1e-11)
