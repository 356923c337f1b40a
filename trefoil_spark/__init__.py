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
