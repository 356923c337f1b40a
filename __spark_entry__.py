"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2,
expressed through the trefoil_spark engine; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL over the same parquet views. Column names are
aliased identically on both sides (the driver hash-compares values after
sorting columns by name).

Float-parity policy: every checked aggregate is either exact (counts,
sums of integers, min/max) or an IEEE-deterministic expression over exact
partial sums (mean/std written as SUM/COUNT expression trees that are
identical in both engines), so value hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trefoil_spark.geometry import pip_sql_expr
from trefoil_spark.grid.bbox import BBox
from trefoil_spark.operators.pip_join import pip_join
from trefoil_spark.operators.zonal import zonal_statistics
from trefoil_spark.raster.classify import classify_block, classify_sql, equal_interval_breaks
from trefoil_spark.raster.gridspec import GridSpec
from trefoil_spark.raster.rasterize import rasterize_zones
from trefoil_spark.raster.synth import synthetic_tiles, value_sql
from trefoil_spark.raster.window_ops import extract_window_pixels, tile_histogram
from trefoil_spark.raster.zonal import tile_zonal_statistics
from trefoil_spark.sources.pages import build_pages, pages_cte_sql
from trefoil_spark.sources.zones import ZONE_LAYER

# the raster fixture grid: dyadic pixels over the fixture region so pixel
# centers are exact IEEE doubles in Spark, numpy, and DuckDB alike
REGION = BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326")
SPEC = GridSpec.from_bbox(REGION, width=1024, height=512)
BREAKS = equal_interval_breaks(0.0, 999.0, 5)
QUERY_BBOX = BBox((-122.3, 33.1, -115.7, 36.9), "EPSG:4326")


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_pages(spark, sf_dir, with_html=False)


def _zone_case_sql() -> str:
    """Burn-order zone assignment as a CASE over generated PIP SQL."""
    cases = []
    for fid in reversed(range(len(ZONE_LAYER))):
        poly = ZONE_LAYER[fid]
        cases.append(f"WHEN {pip_sql_expr('lon', 'lat', poly)} THEN '{poly.value}'")
    return f"CASE {' '.join(cases)} END"


_PAGES_CTE = pages_cte_sql("documents")


# ---------------------------------------------------------------------------
# queries (spark side)
# ---------------------------------------------------------------------------

def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 P1-P4 analog at record grain: geotag → qcell key (pure
    Catalyst integer expressions, codegen; the partition key of the engine)."""
    return _pages(spark, sf_dir).select("doc_id", "lat", "lon", "cell").orderBy("doc_id")


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 J1/J2: broadcast covering-index PIP join with burn-order
    overlap resolution (rasterize-centroid semantics)."""
    joined = pip_join(_pages(spark, sf_dir), ZONE_LAYER, key_cols=["doc_id"])
    return joined.select("doc_id", "url", "zone_value").orderBy("doc_id")


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 A1: zonal statistics {mean,min,max,std,sum,count} over the
    PIP-join result — the flagship zonal-stats pipeline (one shuffle)."""
    joined = pip_join(_pages(spark, sf_dir), ZONE_LAYER, key_cols=["doc_id"])
    joined = joined.withColumn("n_chars", F.length("text"))
    return zonal_statistics(joined, "zone_value", "n_chars").orderBy("zone_value")


def q_count_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 A2 (count by category) over pages."""
    return (
        _pages(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("lang")
    )


def q_tile_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 J1+J3+A1: the full trefoil zonal_stats pipeline on the tile
    engine — rasterize polygons to zone tiles (PIP of pixel centers, burn
    order), join value tiles, per-tile numpy partials, final agg."""
    tiles = synthetic_tiles(spark, SPEC)
    ztiles = rasterize_zones(spark, SPEC, ZONE_LAYER)
    return tile_zonal_statistics(tiles, ztiles).orderBy("zone")


def q_tile_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 P3/P5: bbox → Window (half-pixel-inset reference semantics)
    → tile pruning → intra-tile slice; aggregated so the oracle is stable."""
    tiles = synthetic_tiles(spark, SPEC)
    px = extract_window_pixels(tiles, SPEC, QUERY_BBOX)
    return px.groupBy().agg(
        F.sum("v").alias("sum"),
        F.count("v").alias("count"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
    )


def q_tile_classify_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 F2+A2: digitize-classify tiles, count per class."""
    tiles = synthetic_tiles(spark, SPEC)
    hist = tile_histogram(tiles, transform=lambda b: classify_block(b, BREAKS))
    return hist.withColumn("class", F.col("value").cast("int")).select(
        "class", "count"
    ).orderBy("class")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: zonal stats over the PIP join at sf0.001."""
    return q_zonal_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cell_assign": q_cell_assign,
        "pip_join": q_pip_join,
        "zonal_stats": q_zonal_stats,
        "count_by_lang": q_count_by_lang,
        "tile_zonal_stats": q_tile_zonal_stats,
        "tile_window_stats": q_tile_window_stats,
        "tile_classify_histogram": q_tile_classify_histogram,
    }


def _pixel_cte() -> str:
    """DuckDB pixel-grain twin of the synthetic tile grid."""
    n = SPEC.width * SPEC.height
    return f"""
        px AS (
            SELECT CAST(i // {SPEC.width} AS BIGINT) AS y,
                   CAST(i % {SPEC.width} AS BIGINT) AS x
            FROM (SELECT UNNEST(range({n})) AS i)
        ), geo AS (
            SELECT y, x, {SPEC.lon_sql('x')} AS lon, {SPEC.lat_sql('y')} AS lat,
                   {value_sql('y', 'x')} AS v
            FROM px
        )
    """


def oracle_sql() -> dict[str, str]:
    zone_case = _zone_case_sql()
    return {
        "cell_assign": f"""
            WITH pages AS ({_PAGES_CTE})
            SELECT doc_id, lat, lon, cell FROM pages ORDER BY doc_id
        """,
        "pip_join": f"""
            WITH pages AS ({_PAGES_CTE})
            SELECT doc_id, url, {zone_case} AS zone_value
            FROM pages WHERE {zone_case} IS NOT NULL
            ORDER BY doc_id
        """,
        "zonal_stats": f"""
            WITH pages AS ({_PAGES_CTE}),
            z AS (
                SELECT {zone_case} AS zone_value, LENGTH(text) AS n_chars
                FROM pages
            )
            SELECT zone_value,
                   SUM(CAST(n_chars AS DOUBLE)) / COUNT(n_chars) AS mean,
                   MIN(n_chars) AS min, MAX(n_chars) AS max,
                   SQRT(SUM(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) / COUNT(n_chars)
                        - (SUM(CAST(n_chars AS DOUBLE)) / COUNT(n_chars))
                          * (SUM(CAST(n_chars AS DOUBLE)) / COUNT(n_chars))) AS std,
                   CAST(SUM(n_chars) AS BIGINT) AS sum, COUNT(n_chars) AS count
            FROM z WHERE zone_value IS NOT NULL
            GROUP BY zone_value ORDER BY zone_value
        """,
        "count_by_lang": f"""
            WITH pages AS ({_PAGES_CTE})
            SELECT lang, COUNT(*) AS count FROM pages GROUP BY lang ORDER BY lang
        """,
        "tile_zonal_stats": _tile_zonal_oracle(),
        "tile_window_stats": _tile_window_oracle(),
        "tile_classify_histogram": f"""
            WITH {_pixel_cte()}
            SELECT CAST({classify_sql('v', BREAKS)} AS INT) AS class,
                   COUNT(*) AS count
            FROM geo WHERE v IS NOT NULL
            GROUP BY class ORDER BY class
        """,
    }


def _tile_zonal_oracle() -> str:
    cases = " ".join(
        f"WHEN {pip_sql_expr('lon', 'lat', ZONE_LAYER[fid])} THEN {fid}"
        for fid in reversed(range(len(ZONE_LAYER)))
    )
    return f"""
        WITH {_pixel_cte()},
        z AS (SELECT CASE {cases} END AS zone, v FROM geo)
        SELECT zone,
               SUM(v) / COUNT(v) AS mean, MIN(v) AS min, MAX(v) AS max,
               SQRT(SUM(v*v)/COUNT(v) - (SUM(v)/COUNT(v))*(SUM(v)/COUNT(v))) AS std,
               SUM(v) AS sum, COUNT(v) AS count
        FROM z WHERE zone IS NOT NULL AND v IS NOT NULL
        GROUP BY zone ORDER BY zone
    """


def _tile_window_oracle() -> str:
    w = SPEC.window_for_bbox(QUERY_BBOX)
    y0, y1 = w.y_slice.start, w.y_slice.stop
    x0, x1 = w.x_slice.start, w.x_slice.stop
    return f"""
        WITH {_pixel_cte()}
        SELECT CAST(SUM(v) AS DOUBLE) AS sum, COUNT(v) AS count,
               MIN(y) AS ymin, MAX(y) AS ymax, MIN(x) AS xmin, MAX(x) AS xmax
        FROM geo
        WHERE y >= {y0} AND y < {y1} AND x >= {x0} AND x < {x1}
    """
