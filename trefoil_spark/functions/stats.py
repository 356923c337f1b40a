"""Own statistical special functions — no scipy in this environment.

Closes the A11 tail: the reference's ``linear_regression(..., full=True)``
returns r² and a two-sided p-value via ``scipy.stats.distributions.t.sf``
(/root/reference/trefoil/analysis/timeseries.py:110-127). scipy is absent
here, so the Student-t tail probability is computed with the EXACT
finite-sum closed form for integer degrees of freedom (Abramowitz &
Stegun, Handbook of Mathematical Functions, 26.7.3/26.7.4):

    θ = atan(t/√ν)
    ν even: A(t|ν) = sinθ · Σ_{j=0}^{ν/2-1} c_j cos^{2j}θ,
            c_0 = 1, c_j = c_{j-1}·(2j-1)/(2j)
    ν odd:  A(t|ν) = (2/π)[θ + sinθ · Σ_{j=1}^{(ν-1)/2} d_j cos^{2j-1}θ],
            d_1 = 1, d_j = d_{j-1}·(2j-2)/(2j-1)

where A(t|ν) = P(|T| ≤ t); the two-sided p-value is 1 − A. These are
mathematically exact (not series truncations), so they match scipy's
betainc-based values to float rounding.

The same recurrences are emitted as twin Spark-SQL / DuckDB fold
expressions by ``raster/timeseries.py::regression_full_*`` so the
driver-checked `regression` query hash-matches p bit-for-bit.
"""

from __future__ import annotations

import numpy as np


DF_EXACT_MAX = 2000  # exact finite sums below; asymptotic normal above


def _erfc_as(x: np.ndarray) -> np.ndarray:
    """erfc for x ≥ 0 — Abramowitz & Stegun 7.1.26 rational
    approximation (|ε| ≤ 1.5e-7); the identical polynomial runs as twin
    Spark/DuckDB text in raster/timeseries.py."""
    u = 1.0 / (1.0 + 0.3275911 * x)
    poly = u * (
        0.254829592
        + u * (-0.284496736 + u * (1.421413741 + u * (-1.453152027 + u * 1.061405429)))
    )
    return poly * np.exp(-x * x)


def t_sf_twosided(t: np.ndarray, df: np.ndarray) -> np.ndarray:
    """Two-sided Student-t tail probability P(|T| ≥ t) for integer df ≥ 1.

    Vectorized over mixed df (masked time series give each pixel its own
    df); elements with df < 1 or non-finite t return NaN.

    df ≤ 2000: EXACT A&S 26.7.3/4 finite sums (O(df) terms — bounded).
    df > 2000: moment-matching normal asymptotic
    z = t(1−1/(4df))/√(1+t²/(2df)), p = erfc(z/√2) — measured ≤ 4.3e-8
    absolute error at the df=2001 cut, shrinking as df grows, plus the
    1.5e-7 erfc polynomial bound. Keeps per-element work O(1) instead of
    O(df) — the 100 TB regression groups carry df in the billions.
    """
    t = np.asarray(t, dtype=np.float64)
    df = np.asarray(np.broadcast_to(df, t.shape))
    ok = np.isfinite(t) & (df >= 1)
    tt = np.where(ok, np.abs(t), 0.0)
    big = ok & (df > DF_EXACT_MAX)
    p_big = np.zeros_like(tt)
    if big.any():  # common case (all df small) skips the whole branch
        dfl = np.where(big, df.astype(np.float64), 8.0)
        z = tt * (1.0 - 1.0 / (4.0 * dfl)) / np.sqrt(1.0 + tt * tt / (2.0 * dfl))
        p_big = np.clip(_erfc_as(z / np.sqrt(2.0)), 0.0, 1.0)
    # exact branch (ok_e excludes big, so df here is already ≤ the cap)
    ok_e = ok & ~big
    tt = np.where(ok_e, tt, 0.0)
    nu = np.where(ok_e, df, 1).astype(np.int64)

    theta = np.arctan2(tt, np.sqrt(nu.astype(np.float64)))
    c2 = np.cos(theta) ** 2
    sin_t = np.sin(theta)
    cos_t = np.cos(theta)

    even = nu % 2 == 0
    m_even = nu // 2          # terms j=0..m-1
    m_odd = (nu - 1) // 2     # terms j=1..m

    max_j = int(max(m_even.max(initial=1), m_odd.max(initial=1)))
    # even-df accumulation: term_0 = 1
    term_e = np.ones_like(tt)
    s_e = np.ones_like(tt)
    # odd-df accumulation: term_1 = cosθ
    term_o = cos_t.copy()
    s_o = cos_t.copy()
    for j in range(1, max_j + 1):
        # even: term_j = term_{j-1} * cos²θ * (2j-1)/(2j), valid j <= m-1
        term_e = term_e * c2 * ((2.0 * j - 1.0) / (2.0 * j))
        s_e = np.where(j <= m_even - 1, s_e + term_e, s_e)
        # odd: term_j = term_{j-1} * cos²θ * (2j-2)/(2j-1), valid 2 <= j <= m
        if j >= 2:
            term_o = term_o * c2 * ((2.0 * j - 2.0) / (2.0 * j - 1.0))
            s_o = np.where(j <= m_odd, s_o + term_o, s_o)
    a_even = sin_t * s_e
    a_odd = (2.0 / np.pi) * (theta + sin_t * np.where(m_odd >= 1, s_o, 0.0))
    a = np.where(even, a_even, a_odd)
    p = np.clip(1.0 - a, 0.0, 1.0)
    p = np.where(big, p_big, p)
    return np.where(ok, p, np.nan)


def regression_full_from_sums(
    n: np.ndarray,
    st: np.ndarray,
    stt: np.ndarray,
    sv: np.ndarray,
    svv: np.ndarray,
    stv: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """(r², p) from OLS sufficient statistics — the reference's `full`
    tail (timeseries.py:115-127): r from √r², tiny=1e-20 guard,
    t = r·√(df/((1−r+tiny)(1+r+tiny))), p two-sided with df = n−2."""
    n = np.asarray(n, dtype=np.float64)
    sxx = n * stt - st * st
    syy = n * svv - sv * sv
    sxy = n * stv - st * sv
    good = (n >= 3) & (sxx > 0) & (syy > 0)
    r2 = np.where(good, (sxy * sxy) / np.where(good, sxx * syy, 1.0), np.nan)
    r2 = np.minimum(r2, 1.0)  # guard float overshoot on perfect fits
    r = np.sqrt(r2)
    tiny = 1.0e-20
    df = n - 2.0
    tstat = r * np.sqrt(df / ((1.0 - r + tiny) * (1.0 + r + tiny)))
    p = t_sf_twosided(tstat, df)
    return r2, np.where(good, p, np.nan)
