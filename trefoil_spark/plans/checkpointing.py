"""Checkpoint / resume with per-partition lineage + row-count metrics
(north rule: "every partition emits lineage + row-count metrics to a
checkpoint table so a killed job resumes at tile granularity").

Design (simplest correct, SURVEY.md §7.2):
- outputs are IDEMPOTENT and KEYED (tile keys / cell / doc_id ranges);
- a job runs in key-granular units: ``resume_filter`` anti-joins the done
  keys from the checkpoint table before recomputation (left_anti — the
  restart reads only checkpoint keys, never the old output data);
- ``checkpointed_write`` appends the data AND, transactionally after the
  data commit succeeds, appends one checkpoint row per key with row
  counts + partition lineage. A kill between the two writes re-runs those
  keys; dynamic partition overwrite makes the re-run overwrite, not
  duplicate.

No custom commit protocol: Spark's file committer gives atomic task
commits; the checkpoint table is the unit-of-work ledger above it.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = (
    "stage string, key string, row_count bigint, n_partitions int, committed_at double"
)


def _key_col(key_cols: list[str]):
    return F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])


def done_keys(spark: SparkSession, checkpoint_dir: str, stage: str) -> DataFrame:
    try:
        cp = spark.read.parquet(checkpoint_dir)
    except Exception:
        return spark.createDataFrame([], "key string")
    return cp.filter(F.col("stage") == stage).select("key").distinct()


def resume_filter(
    df: DataFrame, checkpoint_dir: str, stage: str, key_cols: list[str]
) -> DataFrame:
    """Drop work units already committed for this stage (left_anti)."""
    done = done_keys(df.sparkSession, checkpoint_dir, stage)
    keyed = df.withColumn("_cp_key", _key_col(key_cols))
    return keyed.join(F.broadcast(done), keyed["_cp_key"] == done["key"], "left_anti").drop(
        "_cp_key"
    )


def checkpointed_write(
    df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    stage: str,
    key_cols: list[str],
) -> dict:
    """Write remaining work units + append their checkpoint ledger rows.

    Returns {written_rows, written_keys, skipped_keys}. The data write is
    partitioned by the key columns with dynamic partition overwrite, so a
    replay of a half-committed unit overwrites instead of duplicating.
    """
    spark = df.sparkSession
    # persist: the write and the ledger metrics are two actions — with a
    # nondeterministic source, recomputing `todo` for the metrics could
    # commit ledger counts that diverge from the parquet actually written
    todo = resume_filter(df, checkpoint_dir, stage, key_cols).persist()

    skipped = done_keys(spark, checkpoint_dir, stage).count()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    todo.write.partitionBy(*key_cols).mode("overwrite").parquet(out_path)

    # lineage: per-key row counts + how many task partitions contributed
    metrics = (
        todo.withColumn("_pid", F.spark_partition_id())
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.countDistinct("_pid").alias("n_partitions"),
        )
        .select(
            F.lit(stage).alias("stage"),
            _key_col(key_cols).alias("key"),
            "row_count",
            "n_partitions",
            F.lit(time.time()).alias("committed_at"),
        )
    )
    rows = metrics.collect()  # small: one row per work unit
    todo.unpersist()
    if rows:
        spark.createDataFrame(rows, CHECKPOINT_SCHEMA).write.mode("append").parquet(
            checkpoint_dir
        )
    return {
        "written_rows": sum(r["row_count"] for r in rows),
        "written_keys": len(rows),
        "skipped_keys": skipped,
    }
