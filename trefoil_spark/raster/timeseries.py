"""Temporal operators over the tile table (SURVEY.md A5/A6/A11, J4, F1).

Reference semantics:
- statistic_by_interval (analysis/summary.py:87-112): reshape (n/k, k, y, x)
  → mean/sum over axis 1; asserts n % k == 0. The CLI bin_ts variant
  (cli/calc.py:65-129) drops the trailing partial interval with a warning.
- linear_regression (analysis/timeseries.py:79-133): per-pixel OLS of value
  vs timestep via lstsq; mask taken from the t=0 slice (:105-108).
- calculate_delta (cli/calc.py:10-15): elementwise comp-base, (comp-base)/base.

Spark mapping:
- interval agg: groupBy(interval=t/k, ty, tx) + applyInPandas summing
  blocks — ONE shuffle of tile rows keyed (interval, ty, tx). At scale the
  shuffle moves each tile once; partial intervals are filtered out first
  (JVM predicate), mirroring bin_ts truncation.
- regression: same grouping by (ty, tx) over all t; closed-form OLS from
  per-tile accumulated Σt, Σt², Σv, Σtv, n — numpy-vectorized per pixel,
  no per-row Python, algebraically identical to lstsq for 1-D X.
- delta: equi-join of two tile tables on (t, ty, tx) + vectorized block
  arithmetic (broadcast if one side is small, else sort-merge co-keyed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def statistic_by_interval(
    tiles: DataFrame, interval: int, statistic: str = "mean", n_timesteps: int | None = None
) -> DataFrame:
    """Tumbling-window temporal aggregation of tiles.

    ``n_timesteps``: if given, trailing timesteps not filling a whole
    interval are dropped (bin_ts rule, calc.py:99-100); if None the caller
    guarantees n % interval == 0 (summary.py:103 assert).
    """
    if statistic not in ("mean", "sum"):
        raise ValueError(f"Unsupported statistic {statistic}")
    src = tiles
    if n_timesteps is not None:
        full = (n_timesteps // interval) * interval
        src = src.filter(F.col("t") < full)
    src = src.withColumn("interval", (F.col("t") / interval).cast("int"))

    is_mean = statistic == "mean"

    def agg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        h, w = int(first["h"]), int(first["w"])
        acc = np.zeros((h, w), dtype=np.float64)
        cnt = np.zeros((h, w), dtype=np.int64)
        for blk in pdf["block"]:
            v = np.frombuffer(blk, dtype=np.float32).reshape(h, w).astype(np.float64)
            ok = ~np.isnan(v)
            acc[ok] += v[ok]
            cnt += ok
        # numpy masked mean/sum: all-masked pixels stay masked (NaN)
        out = np.where(cnt > 0, acc / np.where(cnt > 0, cnt, 1), np.nan) if is_mean \
            else np.where(cnt > 0, acc, np.nan)
        return pd.DataFrame(
            [
                (
                    str(first["var"]),
                    int(key[0]),
                    int(first["ty"]),
                    int(first["tx"]),
                    int(first["cell"]),
                    out.astype(np.float32).tobytes(),
                    h,
                    w,
                )
            ],
            columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"],
        )

    return src.groupBy("interval", "ty", "tx").applyInPandas(
        agg, schema="var string, t int, ty int, tx int, cell bigint, block binary, h int, w int"
    )


def linear_regression_tiles(tiles: DataFrame, timesteps: list[float] | None = None) -> DataFrame:
    """Per-pixel OLS over the time axis (SURVEY.md A11).

    Returns tile rows with slope + intercept blocks. Closed form:
    slope = (nΣtv − ΣtΣv) / (nΣt² − (Σt)²); intercept = v̄ − slope·t̄ —
    identical to lstsq for one regressor. Reference masks from the t=0
    slice (timeseries.py:105-108): pixels masked at ANY t contribute
    nothing; here a pixel uses exactly the timesteps where it's unmasked.
    """

    def reg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        h, w = int(first["h"]), int(first["w"])
        n = np.zeros((h, w))
        st = np.zeros((h, w))
        stt = np.zeros((h, w))
        sv = np.zeros((h, w))
        stv = np.zeros((h, w))
        for t, blk in zip(pdf["t"], pdf["block"]):
            tv = float(t) if timesteps is None else float(timesteps[int(t)])
            v = np.frombuffer(blk, dtype=np.float32).reshape(h, w).astype(np.float64)
            ok = ~np.isnan(v)
            vv = np.where(ok, v, 0.0)
            n += ok
            st += ok * tv
            stt += ok * tv * tv
            sv += vv
            stv += vv * tv
        denom = n * stt - st * st
        good = (n >= 2) & (denom != 0)
        slope = np.where(good, (n * stv - st * sv) / np.where(good, denom, 1), np.nan)
        intercept = np.where(good, (sv - slope * st) / np.where(good, n, 1), np.nan)
        return pd.DataFrame(
            [
                (
                    int(first["ty"]), int(first["tx"]), int(first["cell"]),
                    slope.astype(np.float32).tobytes(),
                    intercept.astype(np.float32).tobytes(),
                    h, w,
                )
            ],
            columns=["ty", "tx", "cell", "slope_block", "intercept_block", "h", "w"],
        )

    return tiles.groupBy("ty", "tx").applyInPandas(
        reg,
        schema="ty int, tx int, cell bigint, slope_block binary, "
        "intercept_block binary, h int, w int",
    )


def linear_regression_rows(
    df: DataFrame, group_cols, t_col: str, v_col: str, exact_ints: bool = False
) -> DataFrame:
    """Row-grain closed-form OLS (for oracle-checkable queries): one hash
    aggregate, engine-portable expression tree.

    ``exact_ints=True``: inputs are integers — accumulate Σt, Σt², Σv, Σtv
    as BIGINT (exact, order-independent), cast to double only for the
    final slope/intercept arithmetic. This is what makes the result
    bit-identical across engines (double sums are order-dependent)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    typ = "bigint" if exact_ints else "double"
    t = F.col(t_col).cast(typ)
    v = F.col(v_col).cast(typ)
    g = df.filter(v.isNotNull()).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(t).cast("double").alias("_st"),
        F.sum(t * t).cast("double").alias("_stt"),
        F.sum(v).cast("double").alias("_sv"),
        F.sum(t * v).cast("double").alias("_stv"),
    )
    denom = F.col("_n") * F.col("_stt") - F.col("_st") * F.col("_st")
    slope = (F.col("_n") * F.col("_stv") - F.col("_st") * F.col("_sv")) / denom
    return g.select(
        *group_cols,
        slope.alias("slope"),
        ((F.col("_sv") - slope * F.col("_st")) / F.col("_n")).alias("intercept"),
    )


def regression_sql(
    group_cols: str, t_col: str, v_col: str, table: str, exact_ints: bool = False
) -> str:
    """DuckDB twin of linear_regression_rows (same expression tree)."""
    typ = "BIGINT" if exact_ints else "DOUBLE"
    t, v = f"CAST({t_col} AS {typ})", f"CAST({v_col} AS {typ})"
    return f"""
        WITH g AS (
            SELECT {group_cols},
                   CAST(COUNT(*) AS DOUBLE) AS _n,
                   CAST(SUM({t}) AS DOUBLE) AS _st,
                   CAST(SUM({t} * {t}) AS DOUBLE) AS _stt,
                   CAST(SUM({v}) AS DOUBLE) AS _sv,
                   CAST(SUM({t} * {v}) AS DOUBLE) AS _stv
            FROM {table} WHERE {v_col} IS NOT NULL GROUP BY {group_cols}
        )
        SELECT {group_cols},
               (_n * _stv - _st * _sv) / (_n * _stt - _st * _st) AS slope,
               (_sv - ((_n * _stv - _st * _sv) / (_n * _stt - _st * _st)) * _st) / _n
                   AS intercept
        FROM g
    """


def calculate_delta(
    baseline: DataFrame, comparison: DataFrame, proportion: bool = False
) -> DataFrame:
    """J4/F1 (cli/calc.py:10-54): elementwise comp−base or (comp−base)/base
    across two tile tables aligned on (t, ty, tx)."""
    b = baseline.select(
        "t", "ty", "tx", F.col("block").alias("base_block"), "h", "w"
    )
    c = comparison.select(
        "var", "t", "ty", "tx", "cell", F.col("block").alias("comp_block")
    )
    joined = c.join(b, ["t", "ty", "tx"])

    def gen(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                base = np.frombuffer(row.base_block, dtype=np.float32).astype(np.float64)
                comp = np.frombuffer(row.comp_block, dtype=np.float32).astype(np.float64)
                out = comp - base
                if proportion:
                    with np.errstate(divide="ignore", invalid="ignore"):
                        out = out / base
                rows.append(
                    (row.var, int(row.t), int(row.ty), int(row.tx), int(row.cell),
                     out.astype(np.float32).tobytes(), int(row.h), int(row.w))
                )
            yield pd.DataFrame(
                rows, columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"]
            )

    return joined.mapInPandas(
        gen,
        schema="var string, t int, ty int, tx int, cell bigint, block binary, h int, w int",
    )
