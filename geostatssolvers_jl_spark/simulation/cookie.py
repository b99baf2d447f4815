"""Cookie-cutter composition (reference: CookieCutter,
``/root/reference/src/simulation/cookie.jl:27-83``).

Simulate a categorical *master* variable (facies); simulate each secondary
solver over the full domain; select secondary values where the master
realization equals that solver's key (``mask = mreals .== mval; … .=
vreals[mask]``, cookie.jl:74-75).

Spark realization: pure relational composition — the master ensemble and
each secondary ensemble are long DataFrames keyed ``(real_id, cell_id)``;
the cookie-cutter step is an equi-join plus a CASE expression (P5 of
SURVEY §2.2).  Zero UDFs; Catalyst handles the join strategy (ensembles
co-partitioned on real_id make it shuffle-free after the first stage).
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cookie_cutter(
    master: DataFrame,
    mvar: str,
    others: dict[int, DataFrame],
    ovar: str = "z",
) -> DataFrame:
    """master: (real_id, cell_id, mvar); others: master value → ensemble
    (real_id, cell_id, ovar).  Returns (real_id, cell_id, mvar, ovar)."""
    assert len(others) > 0, "cookie-cutter requires secondary solvers"
    joined = master
    arms = []
    for mval, df in others.items():
        alias = f"__cc_{mval}"
        joined = joined.join(
            df.selectExpr(
                "real_id", "cell_id", f"{ovar} AS {alias}"
            ),
            ["real_id", "cell_id"],
            "left",
        )
        arms.append((mval, alias))
    expr = None
    for mval, alias in arms:
        cond = F.col(mvar) == F.lit(mval)
        expr = F.when(cond, F.col(alias)) if expr is None else expr.when(
            cond, F.col(alias)
        )
    return joined.select(
        "real_id", "cell_id", mvar, expr.alias(ovar)
    )
