from pdal_spark.functions.geo import (  # noqa: F401
    geocode,
    haversine_m,
    hex_cell,
    hex_center,
    mercator,
    inv_mercator,
    morton_key,
    qcell,
    qcell_center,
    qcell_parent,
    tile_cell,
)
