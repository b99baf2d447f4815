"""Theoretical variogram models γ(h) and covariances C(h) = sill − γ(h).

Public GSLIB/Matheron forms, matching the models the reference consumes
from Variography.jl (used at ``/root/reference/src/estimation/krig.jl:65``,
``src/simulation/lu.jl:124,131-132`` — covariance as ``sill(γ) .- pairwise``
— and ``src/simulation/fft.jl:98``).  Evaluation is vectorized numpy for the
batched solvers; the stationarity check mirrors ``isstationary`` asserts at
``src/simulation/lu.jl:110`` / ``src/simulation/fft.jl:91-93``.

Conventions (GeoStats.jl-compatible):
  * Gaussian:    γ(h) = (s−n)·(1 − exp(−3(h/r)²)) + n·1(h>0)
  * Spherical:   γ(h) = (s−n)·(1.5(h/r) − 0.5(h/r)³) for h<r else (s−n), +n·1(h>0)
  * Exponential: γ(h) = (s−n)·(1 − exp(−3h/r)) + n·1(h>0)
  * Nugget only: γ(h) = n·1(h>0)
with r = range, s = sill (total, default 1.0), n = nugget (default 0.0).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Variogram:
    range: float = 1.0
    sill: float = 1.0
    nugget: float = 0.0
    stationary: bool = True

    def _structure(self, h: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def gamma(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.float64)
        partial = self.sill - self.nugget
        g = partial * self._structure(h)
        return np.where(h > 0.0, g + self.nugget, 0.0)

    def cov(self, h: np.ndarray) -> np.ndarray:
        """C(h) = sill − γ(h), exactly as ``src/simulation/lu.jl:124``."""
        return self.sill - self.gamma(h)


@dataclass(frozen=True)
class GaussianVariogram(Variogram):
    def _structure(self, h: np.ndarray) -> np.ndarray:
        hr = h / self.range
        return 1.0 - np.exp(-3.0 * hr * hr)


@dataclass(frozen=True)
class SphericalVariogram(Variogram):
    def _structure(self, h: np.ndarray) -> np.ndarray:
        hr = np.minimum(h / self.range, 1.0)
        return 1.5 * hr - 0.5 * hr**3


@dataclass(frozen=True)
class ExponentialVariogram(Variogram):
    def _structure(self, h: np.ndarray) -> np.ndarray:
        return 1.0 - np.exp(-3.0 * h / self.range)


@dataclass(frozen=True, init=False)
class NuggetEffect(Variogram):
    """Pure nugget: γ(h) = n·1(h>0), C(h>0) = 0.  GeoStats.jl's
    NuggetEffect(n) has total sill == nugget, so sill is forced to the
    nugget here, and the signature takes the nugget as the SOLE
    (positional) parameter exactly like GeoStats.jl — the inherited
    dataclass init would bind a positional `NuggetEffect(0.2)` to
    `range` and silently build a unit-sill model (and its nugget=0.0
    default is fully degenerate: sill = 0 ⇒ C ≡ 0, zero regularization,
    every system singular)."""

    def __init__(self, nugget: float = 1.0):
        if nugget <= 0.0:
            raise ValueError("NuggetEffect requires nugget > 0")
        object.__setattr__(self, "range", 1.0)
        object.__setattr__(self, "sill", nugget)
        object.__setattr__(self, "nugget", nugget)
        object.__setattr__(self, "stationary", True)

    def _structure(self, h: np.ndarray) -> np.ndarray:
        return np.zeros_like(h)


@dataclass(frozen=True)
class PowerVariogram(Variogram):
    """Non-stationary model — only exists to exercise the stationarity
    validation path (reference rejects it for LUGS/FFTGS/SGS)."""

    exponent: float = 1.0
    stationary: bool = False

    def _structure(self, h: np.ndarray) -> np.ndarray:
        return (h / self.range) ** self.exponent


def require_stationary(gamma: Variogram, solver: str) -> None:
    if not gamma.stationary:
        raise ValueError(f"{solver}: variogram model must be stationary")
