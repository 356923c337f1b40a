"""Tile-table storage layout (SURVEY.md S1/S5/S13 — the Iceberg-style
partitioned store; Iceberg jars are absent in this sandbox so the layout
is expressed with Spark's native bucketed tables + parquet, which gives
the same physical properties the design needs):

- partition pruning on (var, t) → directory partitions;
- file skipping on cell → sortWithinPartitions("cell") (Z-order locality
  makes min/max row-group stats selective);
- co-located tile⨝tile joins (J3/J4/J5 zonal/delta/mask) → bucketBy on
  (ty, tx): two tables bucketed the same way join with ZERO shuffles.

At 10^12-doc scale the same DDL maps 1:1 onto Iceberg
(PARTITIONED BY (var, t), ORDERED BY cell, bucket(ty, tx)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_tiles_bucketed(
    tiles: DataFrame,
    table: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist a tile DataFrame as a bucketed, cell-sorted table."""
    (
        tiles.write.mode(mode)
        .bucketBy(n_buckets, "ty", "tx")
        .sortBy("ty", "tx", "cell")
        .format("parquet")
        .saveAsTable(table)
    )


def read_tiles(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cokeyed_join(values_table: DataFrame, zones_table: DataFrame) -> DataFrame:
    """Tile⨝tile equi-join on (ty, tx); when both sides are bucketed on
    (ty, tx) with equal bucket counts this is shuffle-free (the 100 TB
    plan for zonal/delta/mask joins where neither side broadcasts)."""
    return values_table.join(zones_table, ["ty", "tx"])
