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
from trefoil_spark.operators.pip_join import pip_join
from trefoil_spark.operators.zonal import zonal_statistics
from trefoil_spark.sources.pages import build_pages, pages_cte_sql
from trefoil_spark.sources.zones import ZONE_LAYER


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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: zonal stats over the PIP join at sf0.001."""
    return q_zonal_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cell_assign": q_cell_assign,
        "pip_join": q_pip_join,
        "zonal_stats": q_zonal_stats,
        "count_by_lang": q_count_by_lang,
    }


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
    }
