"""Gate registry extension 237 — NTv2 datum-shift grid
(+proj=hgridshift, r5). The gate runs the REAL grid path: a .gsb
file is synthesized at plan time with a LINEAR shift field sampled
on an all-dyadic lattice (grid origin/increment are powers of two
in arcseconds, shift coefficients dyadic, query points on a
2^-5-degree lattice), so every bilinear product in the numpy kernel
is EXACT in f8 and the interpolated value equals the closed-form
linear field bit-for-bit — the DuckDB oracle evaluates that closed
form and the final lat/lon compositions in the kernel's own
operation order, making raw doubles hash-exact with no rounding.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# all-dyadic grid geometry (arcsec, longitudes positive west)
_S_LAT = -262144.0   # -2^18 ~ -72.8 deg
_N_LAT = 262144.0
_E_LONG = -524288.0  # -2^19 ~ east boundary +145.6 deg
_W_LONG = 524288.0
_INC = 4096.0        # 2^12 arcsec
# dyadic linear shift coefficients (arcsec)
_A, _B, _C = 1.25, 0.015625, -0.0078125          # dlat
_D, _E, _F = -2.0, 0.03125, 0.0078125            # dlon


def _grid_path() -> str:
    """Write the synthetic .gsb once per host (content-stable)."""
    import numpy as np

    from pdal_spark.operators.datumshift import write_ntv2

    fp = os.path.join("/tmp", "pdal_spark_gate_hgridshift.gsb")
    if not os.path.exists(fp):
        nrow = int((_N_LAT - _S_LAT) / _INC) + 1
        ncol = int((_W_LONG - _E_LONG) / _INC) + 1
        i = np.arange(nrow)[:, None]
        j = np.arange(ncol)[None, :]
        dlat = _A + _B * i + _C * j
        dlon = _D + _E * i + _F * j
        tmp = fp + f".{os.getpid()}"
        write_ntv2(tmp, [{
            "name": "GATE", "s_lat": _S_LAT, "n_lat": _N_LAT,
            "e_long": _E_LONG, "w_long": _W_LONG,
            "lat_inc": _INC, "long_inc": _INC,
            "dlat": dlat, "dlon": dlon,
        }])
        os.replace(tmp, fp)
    return fp


# dyadic query lattice from event_id (2^-5 deg steps)
_H = G.lehmer2("event_id")
_LAT_D = f"((({_H} % 4096) - 2048) * {G.fnum(0.03125)})"
_LON_D = f"(((({_H} * 48271) % {G.M31}) % 8192 - 4096) " \
    f"* {G.fnum(0.03125)})"


def _hgs_sql() -> str:
    # closed form in the kernel's op order: fi/fj exact, linear
    # field exact, then /3600 and +/- as single rounded ops
    fi = f"((lat * {G.fnum(3600.0)} - {G.fnum(_S_LAT)}) " \
        f"/ {G.fnum(_INC)})"
    fj = f"(((0.0e0 - lat) * 0.0e0 + (0.0e0 - lon) " \
        f"* {G.fnum(3600.0)} - {G.fnum(_E_LONG)}) / {G.fnum(_INC)})"
    dlat = f"({G.fnum(_A)} + {G.fnum(_B)} * {fi} " \
        f"+ {G.fnum(_C)} * {fj})"
    dlon = f"({G.fnum(_D)} + {G.fnum(_E)} * {fi} " \
        f"+ {G.fnum(_F)} * {fj})"
    return f"""
    WITH p AS MATERIALIZED (
      SELECT event_id, {_LAT_D} AS lat, {_LON_D} AS lon FROM events
    )
    SELECT event_id,
           lat + {dlat} / {G.fnum(3600.0)} AS lat_nad,
           lon - {dlon} / {G.fnum(3600.0)} AS lon_nad
    FROM p
    """


@gate("hgridshift_ntv2", _hgs_sql())
def q_hgridshift_ntv2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.datumshift import hgridshift

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr(_LAT_D).alias("lat"),
        F.expr(_LON_D).alias("lon"),
    )
    out = hgridshift(ev, _grid_path(), lon="lon", lat="lat")
    return out.select(
        "event_id",
        F.col("lat").alias("lat_nad"),
        F.col("lon").alias("lon_nad"),
    )
