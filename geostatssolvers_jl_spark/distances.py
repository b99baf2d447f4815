"""Distance metrics, as SQL expression builders (JVM-side, codegen) and
numpy kernels (inside Arrow-batched UDFs).

Mirrors the reference's metric surface: ``Euclidean()`` default
(``/root/reference/src/estimation/idw.jl:53``) and ``Haversine(radius)``
(``test/estimation/idw.jl:25``, ``test/estimation/lwr.jl:51``).  The SQL
form and the numpy form use the same operation order so Spark, DuckDB and
the UDF kernels agree bit-for-bit on IEEE doubles.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Euclidean:
    def sql(self, a: tuple[str, ...], b: tuple[str, ...]) -> str:
        terms = " + ".join(f"(({x}) - ({y})) * (({x}) - ({y}))" for x, y in zip(a, b))
        return f"sqrt({terms})"

    def np(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        """A: (n, d), B: (m, d) → (n, m) pairwise distances."""
        d2 = np.sum((A[:, None, :] - B[None, :, :]) ** 2, axis=2)
        return np.sqrt(d2)

    def np_pairs(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        """A: (n, d), B: (n, k, d) → (n, k) distances, canonical op order
        (matches `sql` bit-for-bit)."""
        d = A[:, None, :] - B
        return np.sqrt(np.sum(d * d, axis=-1))

    # --- fast ranking surrogate (BLAS GEMM): key = squared distance ---
    # Callers CENTER the float64 features on the data mean and cast to
    # float32 (see neighbors.topk_search): the key ‖q‖²−2q·d+‖d‖² cancels
    # catastrophically whenever ‖features‖ ≫ span — UTM-like 1e6 planar
    # coords, or a sub-km Haversine cluster whose unit vectors all sit
    # within one float32 ulp of each other.

    def rank_features(self, P: np.ndarray) -> np.ndarray:
        """float64 ranking features; the caller centers + casts float32."""
        return np.asarray(P, dtype=np.float64)

    def rank_keys(self, QF: np.ndarray, DF: np.ndarray) -> np.ndarray:
        """(n, m) keys, monotone in true distance: ‖q‖²−2q·d+‖d‖²."""
        qn = np.einsum("nd,nd->n", QF, QF)[:, None]
        dn = np.einsum("md,md->m", DF, DF)[None, :]
        return qn - np.float32(2.0) * (QF @ DF.T) + dn


@dataclass(frozen=True)
class Haversine:
    """Great-circle distance; coords are (lon, lat) in degrees, matching the
    reference's Distances.jl Haversine convention."""

    radius: float = 6371.0

    def sql(self, a: tuple[str, ...], b: tuple[str, ...]) -> str:
        lon1, lat1 = a
        lon2, lat2 = b
        return (
            f"(2.0 * {self.radius!r} * asin(least(1.0, sqrt("
            f"pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2) + "
            f"cos(radians({lat1})) * cos(radians({lat2})) * "
            f"pow(sin(radians(({lon2}) - ({lon1})) / 2.0), 2)))))"
        )

    def np(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        # mirrors the SQL op order exactly (radians of the *degree diff*)
        lon1, lat1 = A[:, 0][:, None], A[:, 1][:, None]
        lon2, lat2 = B[:, 0][None, :], B[:, 1][None, :]
        h = (
            np.sin(np.radians(lat2 - lat1) / 2.0) ** 2
            + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2))
            * np.sin(np.radians(lon2 - lon1) / 2.0) ** 2
        )
        return 2.0 * self.radius * np.arcsin(np.minimum(1.0, np.sqrt(h)))

    def np_pairs(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        """A: (n, 2) lon/lat deg, B: (n, k, 2) → (n, k), canonical op order."""
        lon1, lat1 = A[:, None, 0], A[:, None, 1]
        lon2, lat2 = B[..., 0], B[..., 1]
        h = (
            np.sin(np.radians(lat2 - lat1) / 2.0) ** 2
            + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2))
            * np.sin(np.radians(lon2 - lon1) / 2.0) ** 2
        )
        return 2.0 * self.radius * np.arcsin(np.minimum(1.0, np.sqrt(h)))

    # --- fast ranking surrogate: key = squared CHORD distance -----------
    # haversine h = (1 − u·v)/2 = ‖u−v‖²/4 with u, v unit vectors, and
    # dist = 2R·asin(√h) is monotone in ‖u−v‖² — so ranking needs only one
    # GEMM over 3-D features, and the squared-chord form survives the
    # caller's mean-centering EXACTLY (‖(u−c)−(v−c)‖² = ‖u−v‖²), unlike
    # the raw dot product whose values all collapse to within one float32
    # ulp of −1 on sub-km clusters; the expensive trig runs on selected
    # pairs only.

    def rank_features(self, P: np.ndarray) -> np.ndarray:
        lam, phi = np.radians(P[:, 0]), np.radians(P[:, 1])
        cphi = np.cos(phi)
        return np.column_stack(
            [cphi * np.cos(lam), cphi * np.sin(lam), np.sin(phi)]
        )

    rank_keys = Euclidean.rank_keys


@dataclass(frozen=True)
class Anisotropic:
    """Ellipsoid (MetricBall((r₁, r₂, ...))) metric — the reference's
    anisotropic neighborhoods (``test/simulation/lu.jl:59``): Euclidean
    distance after per-axis scaling by 1/rᵢ, so the unit ball is the
    ellipsoid.  Pair with a variogram of range 1 for the GeoStats
    ``GaussianVariogram(ball)`` pattern."""

    radii: tuple[float, ...]

    def sql(self, a: tuple[str, ...], b: tuple[str, ...]) -> str:
        # scale-THEN-subtract mirrors `np` (Euclidean on scaled points)
        # bit-for-bit; (a−b)/r differs at 1 ulp, which would fork the
        # tiled join's SQL distances from the broadcast kernel's numpy
        # distances on near-ties
        terms = " + ".join(
            f"((({x}) / {r!r} - ({y}) / {r!r})) * "
            f"((({x}) / {r!r} - ({y}) / {r!r}))"
            for x, y, r in zip(a, b, self.radii)
        )
        return f"sqrt({terms})"

    def _scaled(self, P: np.ndarray) -> np.ndarray:
        r = np.asarray(self.radii, dtype=np.float64)
        if P.shape[-1] != r.shape[0]:
            raise ValueError(
                f"Anisotropic metric has {r.shape[0]} radii but points are "
                f"{P.shape[-1]}-dimensional"
            )
        return P / r[None, :]

    def np(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        return Euclidean().np(self._scaled(A), self._scaled(B))

    def np_pairs(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        # scale-then-subtract: same op order as `sql` and `np`
        r = np.asarray(self.radii, dtype=np.float64)
        d = A[:, None, :] / r - B / r
        return np.sqrt(np.sum(d * d, axis=-1))

    def rank_features(self, P: np.ndarray) -> np.ndarray:
        return self._scaled(P)

    rank_keys = Euclidean.rank_keys


Distance = Euclidean | Haversine | Anisotropic


def validate_planar_metric(
    metric: "Distance | None", ndims: int, solver: str,
) -> None:
    """Shared plan-time guard for the grid simulators (LUGS/FFTGS/SGS):
    grid simulation is planar, so only Euclidean/Anisotropic metrics are
    meaningful — Haversine would silently read grid coords as lon/lat
    degrees and build garbage covariances — and an Anisotropic radii
    tuple must match the grid dimension or the executor-side scaling
    fails with an opaque broadcast error.  One helper so the three
    solvers cannot drift (they previously each re-implemented this with
    divergent blacklist/whitelist logic)."""
    if metric is None or isinstance(metric, Euclidean):
        return
    if isinstance(metric, Anisotropic):
        if len(metric.radii) != ndims:
            raise ValueError(
                f"metric has {len(metric.radii)} radii for a "
                f"{ndims}-D grid"
            )
        return
    raise ValueError(
        f"{solver} supports Euclidean/Anisotropic metrics, got {metric}"
    )
