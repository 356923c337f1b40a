"""Zone (polygon) fixture layer — mirrors the reference's tmin_zones.shp
role (2 WGS84 polygons over ~(-117.5..-115.8, 33.5..35.2); see
/root/reference/trefoil/cli/zones.py:85-119) extended per FIXTURES.md §2:
convex + concave + a small dense-urban polygon that captures the hot page
cluster (skew exerciser), with deliberate overlap to exercise burn order.

Burn-order semantics: GDAL's rasterize burns features in order, later
features overwriting earlier ones (reference zones.py:136-144). Our PIP
join resolves multi-matches the same way: the HIGHEST feature_id wins.

Vertex coordinates deliberately avoid round lattice values so synthetic
points never land exactly on edges (keeps the strict-inequality crossing
test unambiguous across engines).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..geometry import Polygon

# feature order = burn order (last wins on overlap)
ZONE_LAYER: list[Polygon] = [
    Polygon(
        [[(-124.9501, 32.2503), (-119.5497, 32.2503), (-119.5497, 36.9507),
          (-122.2501, 37.7503), (-124.9501, 36.9507)]],
        value="west",
    ),
    Polygon(  # concave: notch dips at the top middle
        [[(-119.5497, 32.2503), (-113.2503, 32.2503), (-113.2503, 37.5501),
          (-116.4009, 35.2497), (-119.5497, 37.5501)]],
        value="east",
    ),
    Polygon(  # dense urban box containing the hot page cluster (inside "east")
        [[(-118.3503, 33.8507), (-118.0497, 33.8507), (-118.0497, 34.1503),
          (-118.3503, 34.1503)]],
        value="urban",
    ),
]


ZONE_SCHEMA = StructType(
    [
        StructField("feature_id", LongType(), False),
        StructField("zone_value", StringType(), False),
        StructField("rings", ArrayType(ArrayType(DoubleType())), False),
        StructField("xmin", DoubleType(), False),
        StructField("ymin", DoubleType(), False),
        StructField("xmax", DoubleType(), False),
        StructField("ymax", DoubleType(), False),
    ]
)


def zone_layer_df(spark: SparkSession, polygons: list[Polygon] | None = None):
    """Vector layer as a small DataFrame (broadcast side of spatial joins)."""
    polygons = polygons if polygons is not None else ZONE_LAYER
    rows = []
    for fid, poly in enumerate(polygons):
        xmin, ymin, xmax, ymax = poly.bbox
        rows.append((fid, str(poly.value), poly.flat_rings(), xmin, ymin, xmax, ymax))
    return spark.createDataFrame(rows, ZONE_SCHEMA).withColumn(
        "bbox", F.struct("xmin", "ymin", "xmax", "ymax")
    )
