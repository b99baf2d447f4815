"""Indicator kriging — ccdf estimation by kriging threshold indicators
(public GSLIB `ik3d` semantics; Goovaerts 1997 ch. 7).  The natural
companion of the round-6 indicator VARIOGRAMS: γ_I diagnoses the
exceedance-set structure, this operator maps P[Z(x) ≤ t].

Pure composition: the indicator transform is a projection, each
threshold runs the existing `solve_kriging` kernel (kriging weights
depend only on coordinates and the variogram — the indicator data
only changes the weighted sum), and the standard ORDER-RELATION
correction (clamp to [0, 1], then enforce a non-decreasing ccdf across
thresholds) is a window running-max — all declarative, no new kernel.

Scale shape: T thresholds = T independent zero-shuffle solves over the
same grid (embarrassingly parallel across thresholds on a cluster) +
one window keyed on cell_id.  The correction contract is FIXED as
round(optional) → clamp → running max, in that order, so the DuckDB
twin reproduces the exact same doubles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

from .kriging import KrigingModel, solve_kriging


def solve_indicator_kriging(
    data: DataFrame,
    grid_df: DataFrame,
    thresholds,
    var: str = "z",
    model: KrigingModel | None = None,
    id_col: str = "cell_id",
    correct_order: bool = True,
    round_to: int | None = None,
    **kw,
) -> DataFrame:
    """Returns long-form ``(id_col, threshold, prob)`` — the estimated
    ccdf P[Z ≤ t] per cell per threshold.  ``round_to`` rounds each
    per-threshold estimate BEFORE the order correction (the gate twin
    passes 6 so clamp/max operate on identical doubles cross-engine);
    ``correct_order=False`` returns the raw per-threshold kriging
    estimates (possibly <0, >1, or non-monotone — the diagnostic
    view)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ts = sorted(float(t) for t in thresholds)
    if not ts:
        raise ValueError("solve_indicator_kriging: no thresholds")
    if len(set(ts)) != len(ts):
        raise ValueError("solve_indicator_kriging: duplicate thresholds")
    outs = []
    for t in ts:
        # a bare WHEN <= t OTHERWISE 0 would map NULL z to 0.0 —
        # missing data must stay missing for solve_kriging's
        # non-missing filter
        ind = data.withColumn(var, F.expr(
            f"CASE WHEN {var} IS NULL THEN NULL "
            f"WHEN {var} <= {t!r} THEN 1.0 ELSE 0.0 END"))
        sol = solve_kriging(ind, grid_df, var=var, model=model,
                            id_col=id_col, **kw)
        p = F.col(var)
        if round_to is not None:
            p = F.round(p, int(round_to))
        outs.append(sol.select(
            F.col(id_col), F.lit(t).alias("threshold"), p.alias("_p")))
    u = reduce(lambda a, b: a.unionAll(b), outs)
    if not correct_order:
        return u.withColumnRenamed("_p", "prob")
    clamped = F.least(F.greatest(F.col("_p"), F.lit(0.0)), F.lit(1.0))
    w = (Window.partitionBy(id_col).orderBy("threshold")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return u.select(
        F.col(id_col), F.col("threshold"),
        (F.max(clamped).over(w) + F.lit(0.0)).alias("prob"))


def etype_sql(ccdf_rel: str, thresholds, zmin: float, zmax: float,
              prob_col: str = "prob", round_to: int = 6,
              quantized: bool = False) -> str:
    """E-type estimate (GSLIB ``postik`` semantics): the conditional
    mean implied by the estimated ccdf, with the class-midpoint
    convention — bin (t_{i−1}, t_i] is represented by its midpoint,
    the lower tail starts at ``zmin`` and the upper tail ends at
    ``zmax`` (the data extremes, the modeler's tail contract).  Pure
    shared-dialect SQL over the long-form (cell_id, threshold, prob)
    relation, so the oracle twin is this same text over its own ccdf.

    e(x) = Σᵢ (t_{i−1}+t_i)/2 · (F_i − F_{i−1})  +  (t_k+zmax)/2 · (1 − F_k)
    with t_0 = zmin, F_0 = 0.

    ``quantized=True`` emits BIGINT NANO-units instead
    (``e_nano = round(e·1e9)`` exactly when the bin midpoints are exact
    at 3 decimals): probabilities quantize to micro-units and midpoints
    to milli-units FIRST, so the aggregation is pure integer arithmetic
    — the float form's products of round-6 probs land on round-6
    halfway points where Spark (half-up) and DuckDB (half-even)
    disagree in the last digit (observed at the gate), which integers
    cannot."""
    ts = sorted(float(t) for t in thresholds)
    if not ts:
        raise ValueError("etype_sql: no thresholds")
    zmin, zmax = float(zmin), float(zmax)
    if not (zmin <= ts[0] and ts[-1] <= zmax):
        raise ValueError("etype_sql: thresholds must lie inside "
                         "[zmin, zmax]")
    tk = ts[-1]
    prefix = f"""
WITH _c AS (
  SELECT cell_id, threshold, {prob_col} AS p FROM {ccdf_rel}
), _d AS (
  SELECT cell_id, threshold, p,
         lag(p, 1, 0.0) OVER (PARTITION BY cell_id
                              ORDER BY threshold) AS p0,
         lag(threshold, 1, {zmin!r}) OVER (PARTITION BY cell_id
                                           ORDER BY threshold) AS t0
  FROM _c
)"""
    if quantized:
        for a, b in zip([zmin] + ts, ts + [zmax]):
            mid = (a + b) / 2.0 * 1000.0
            if abs(mid - round(mid)) > 1e-9:
                raise ValueError(
                    f"etype_sql(quantized): bin midpoint {(a + b) / 2.0} "
                    f"is not exact at 3 decimals — use the float form")
        return prefix + f"""
SELECT cell_id,
       CAST(SUM(CAST(round((t0 + threshold) * 500.0) AS BIGINT)
                * (CAST(round(p * 1000000.0) AS BIGINT)
                   - CAST(round(p0 * 1000000.0) AS BIGINT)))
            + (1000000 - MAX(CASE WHEN threshold = {tk!r} THEN
                 CAST(round(p * 1000000.0) AS BIGINT) END))
              * CAST(round(({tk!r} + {zmax!r}) * 500.0) AS BIGINT)
            AS BIGINT) AS e_nano
FROM _d GROUP BY cell_id"""
    return prefix + f"""
SELECT cell_id,
       round(SUM((t0 + threshold) / 2.0 * (p - p0))
             + (1.0 - MAX(CASE WHEN threshold = {tk!r} THEN p END))
               * (({tk!r} + {zmax!r}) / 2.0),
             {int(round_to)}) + 0.0 AS e_type
FROM _d GROUP BY cell_id"""


def quantile_sql(ccdf_rel: str, thresholds, p: float, zmin: float,
                 zmax: float, prob_col: str = "prob",
                 quantized: bool = True) -> str:
    """Conditional p-quantile map from the corrected ccdf (the other
    GSLIB ``postik`` output): per cell, the value where F crosses
    ``p``, linearly interpolated within the bracketing bin — tails
    interpolate against (zmin, 0) and an appended terminal (zmax, 1)
    row.  The order-corrected F is non-decreasing, so the predicate
    ``F_{i−1} < p ≤ F_i`` selects exactly one row per cell (flat
    plateaus are skipped by the strict left inequality).

    ``quantized=True`` (default, and what the gate uses) emits BIGINT
    nano-units: thresholds/zmin/zmax must be exact at 3 decimals; the
    interpolation becomes ``t0_nano + floor(num/den)`` of exact
    integers — the double division of two integers below 2^53 is
    correctly rounded identically on both engines and its floor cannot
    sit within an ulp of a non-equal integer (denominator ≤ 1e6), so
    the output is deterministic with zero rounding tolerance."""
    ts = sorted(float(t) for t in thresholds)
    if not ts:
        raise ValueError("quantile_sql: no thresholds")
    if not 0.0 < p < 1.0:
        raise ValueError("quantile_sql: p must be in (0, 1)")
    zmin, zmax = float(zmin), float(zmax)
    if not (zmin <= ts[0] and ts[-1] <= zmax):
        raise ValueError("quantile_sql: thresholds must lie inside "
                         "[zmin, zmax]")
    if quantized:
        for t in ts + [zmin, zmax]:
            if abs(t * 1000.0 - round(t * 1000.0)) > 1e-9:
                raise ValueError(
                    "quantile_sql(quantized): thresholds and bounds "
                    "must be exact at 3 decimals — use quantized=False")
    pm = int(round(p * 1_000_000))
    base = f"""
WITH _c AS (
  SELECT cell_id, threshold, {prob_col} AS pr FROM {ccdf_rel}
  UNION ALL
  SELECT DISTINCT cell_id, CAST({zmax!r} AS DOUBLE) AS threshold,
         1.0 AS pr FROM {ccdf_rel}
), _d AS (
  SELECT cell_id, threshold, pr,
         lag(pr, 1, 0.0) OVER (PARTITION BY cell_id
                               ORDER BY threshold) AS pr0,
         lag(threshold, 1, {zmin!r}) OVER (PARTITION BY cell_id
                                           ORDER BY threshold) AS t0
  FROM _c
)"""
    if quantized:
        t_m = "CAST(round(threshold * 1000.0) AS BIGINT)"
        t0_m = "CAST(round(t0 * 1000.0) AS BIGINT)"
        f_u = "CAST(round(pr * 1000000.0) AS BIGINT)"
        f0_u = "CAST(round(pr0 * 1000000.0) AS BIGINT)"
        return base + f"""
SELECT cell_id,
       CAST({t0_m} * 1000000
            + CAST(floor(CAST(({pm} - {f0_u}) * ({t_m} - {t0_m})
                              * 1000000 AS DOUBLE)
                         / ({f_u} - {f0_u})) AS BIGINT)
            AS BIGINT) AS q_nano
FROM _d
WHERE {f0_u} < {pm} AND {pm} <= {f_u}"""
    return base + f"""
SELECT cell_id,
       t0 + ({p!r} - pr0) * (threshold - t0) / (pr - pr0) AS q
FROM _d
WHERE pr0 < {p!r} AND {p!r} <= pr"""
