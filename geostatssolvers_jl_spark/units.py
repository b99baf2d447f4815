"""Physical-unit metadata (reference: ``/root/reference/src/utils.jl:5-15``
+ unit-propagation tests ``test/estimation/idw.jl:30-41``,
``test/estimation/lwr.jl:56-69``).

Spark has no unit types; the engine carries per-column unit metadata and
applies the reference's ``uadjust`` as an explicit projection: affine units
(°C, °F) convert to their absolute base (K) *before* math, and variance
columns carry unit² — exactly the reference's rules (γ outputs
``varμ * elunit²`` at ``krig.jl:160``, ``lwr.jl:153``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Unit:
    name: str
    base: str        # absolute base unit
    scale: float = 1.0
    offset: float = 0.0  # affine: base = value * scale + offset

    @property
    def is_affine(self) -> bool:
        return self.offset != 0.0

    def squared(self) -> str:
        return f"{self.base}^2"


UNITS: dict[str, Unit] = {
    "K": Unit("K", "K"),
    "degC": Unit("degC", "K", 1.0, 273.15),
    "degF": Unit("degF", "K", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
    "m": Unit("m", "m"),
    "km": Unit("km", "m", 1000.0),
    "": Unit("", ""),
}


def uadjust(df: DataFrame, col: str, unit_name: str) -> tuple[DataFrame, str]:
    """Affine→absolute normalization projection (utils.jl:10-15).
    Returns (adjusted df, resulting unit name)."""
    u = UNITS[unit_name]
    if u.scale == 1.0 and u.offset == 0.0:
        return df, u.base
    out = df.selectExpr(
        *[c for c in df.columns if c != col],
        f"({col} * {u.scale!r} + {u.offset!r}) AS {col}",
    )
    return out, u.base


def result_units(var_unit: str, var: str) -> dict[str, str]:
    """Unit metadata for an estimation result: mean keeps the (absolute)
    unit, variance gets unit² (idw's σ is a distance → coordinate units,
    handled by callers)."""
    u = UNITS[var_unit]
    return {var: u.base, f"{var}_variance": u.squared()}
