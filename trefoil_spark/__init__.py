"""trefoil_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the capabilities of consbio/trefoil
(reference at /root/reference, cited by file:line in docstrings) as a
distributed engine: NetCDF-style grids become Arrow-backed tile DataFrames
(fixed 256x256 numpy blocks keyed by a Z-order "qcell" spatial index), and
trefoil's operators — window/bbox extraction, warping, classification,
zonal statistics, render-to-image tiling — run as vectorized pandas/Arrow
UDFs or pure Catalyst expressions over DataFrames of web-scale records.

Design stance (see SURVEY.md §7.0): DataFrame-first, no RDDs, no per-row
Python; dense math in numpy over Arrow batches; relational glue stays
JVM-side for whole-stage codegen.
"""

__version__ = "0.1.0"

TILE_SIZE = 256


def _tune_python_worker() -> None:
    """One-time Python-WORKER tuning (guide §4.5: heavyweight setup once
    per worker, amortized by `spark.python.worker.reuse`).

    pyspark's per-task worker setup calls ``importlib.invalidate_caches()``
    (worker_util.setup_spark_files), and CPython's ``zipimporter``
    eagerly re-reads its archive's end-of-central-directory on every
    invalidation. With SPARK_HOME's pyspark.zip / py4j zip / a jar on
    every worker's sys.path that is ~100-190 ms of re-parsing zip TOCs
    PER TASK — measured as the floor of every Python-bearing stage on
    this engine (a trivial 1-task mapInPandas job: 270 ms wall, of which
    ~190 ms was this). Archives on sys.path do not change mid-session,
    so the re-read is pure waste: make zip-archive invalidation a no-op
    in this worker. Directory finders (FileFinder) keep their normal
    invalidation, so ``addPyFile``'d plain .py files are still picked up
    (they land in the spark-files DIRECTORY); only an existing zip whose
    bytes are rewritten in place mid-session would be missed — a
    scenario Spark itself does not support.

    Runs only inside a Python worker (gated on pyspark.worker/daemon
    being loaded), at most once per process; the driver is untouched.
    """
    import sys

    if "pyspark.daemon" not in sys.modules and "pyspark.worker" not in sys.modules:
        return
    try:
        import zipimport

        if getattr(zipimport.zipimporter.invalidate_caches, "_trefoil_noop", False):
            return
        def _noop_invalidate(self):  # archives are immutable in-session
            return None
        _noop_invalidate._trefoil_noop = True
        zipimport.zipimporter.invalidate_caches = _noop_invalidate
    except Exception:  # never let tuning break a task
        pass


_tune_python_worker()
