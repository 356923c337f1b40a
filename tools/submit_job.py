"""spark-submit entry point (the north rule's deployment shape).

Package + run:
    python tools/make_pyfiles.py                  # → dist/trefoil_spark.zip
    spark-submit --master local[8] \
        --py-files dist/trefoil_spark.zip \
        tools/submit_job.py [sf_dir] [query]

The job imports the engine ONLY from the --py-files zip (no repo on
sys.path), runs one driver-contract query, and prints a single JSON line
— the same artifact/launch shape a multi-executor cluster run uses
(swap --master for the cluster URL; executors receive the zip
automatically).
"""

import json
import sys
import time

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    qname = sys.argv[2] if len(sys.argv) > 2 else "zonal_stats"

    spark = (
        SparkSession.builder.appName(f"trefoil_submit_{qname}")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # import from the shipped zip (spark-submit puts --py-files on sys.path)
    from trefoil_spark.operators.pip_join import pip_join  # noqa: F401 (probe)
    import __spark_entry__ as entry

    fn = entry.queries()[qname]
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).collect()
    print(
        json.dumps(
            {
                "query": qname,
                "sf_dir": sf_dir,
                "rows": len(rows),
                "sec": round(time.perf_counter() - t0, 3),
                "first": str(rows[0]) if rows else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
