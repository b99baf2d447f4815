"""Cartesian grid domains as *virtual* DataFrames.

The reference models estimation domains as ``CartesianGrid`` objects whose
cell centroids are pure functions of the linear cell index
(``/root/reference/test/estimation/krig.jl:7,26``; centroid access at
``/root/reference/src/estimation/idw.jl:115``).  In Spark we never
materialize geometry: a grid is ``spark.range(prod(dims))`` plus
whole-stage-codegen arithmetic — scans of a 10^10-cell grid cost nothing
until an action, partition pruning/column pruning are automatic, and the
grid can be regenerated identically on any executor.

Linear index convention is Julia column-major (``LinearIndices``):
``cell_id = (j-1)*nx + (i-1)`` with 1-based (i, j) — the reference's golden
cells ``Z[25,25]`` etc. (``test/estimation/krig.jl:35-37``) address cells in
this order.

The same arithmetic is emitted as a DuckDB SQL snippet (`duck_sql`) so the
driver's oracle runs the *identical* expression shapes — identical IEEE
double results, bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import prod

from pyspark.sql import DataFrame, SparkSession

AXES = ("x", "y", "z")


@dataclass(frozen=True)
class CartesianGrid:
    """dims per axis; origin = minimum corner; spacing per axis.

    ``CartesianGrid((100,100),(0.5,0.5),(1.0,1.0))`` in the reference ⇔
    ``CartesianGrid(dims=(100,100), origin=(0.5,0.5), spacing=(1.0,1.0))``.
    Centroid of 1-based cell (i, …) on axis a: ``origin[a] + (i-0.5)*spacing[a]``.
    """

    dims: tuple[int, ...]
    origin: tuple[float, ...] = ()
    spacing: tuple[float, ...] = ()

    def __post_init__(self):
        nd = len(self.dims)
        if not self.origin:
            object.__setattr__(self, "origin", (0.0,) * nd)
        if not self.spacing:
            object.__setattr__(self, "spacing", (1.0,) * nd)
        assert len(self.origin) == nd and len(self.spacing) == nd

    @classmethod
    def from_extent(
        cls, start: tuple[float, ...], finish: tuple[float, ...], dims: tuple[int, ...]
    ) -> "CartesianGrid":
        """Reference's ``CartesianGrid(start, finish, dims=...)`` constructor
        (``test/estimation/lwr.jl:43-48``): spacing = (finish-start)/dims."""
        spacing = tuple((f - s) / d for s, f, d in zip(start, finish, dims))
        return cls(dims=tuple(dims), origin=tuple(start), spacing=spacing)

    @property
    def ncells(self) -> int:
        return prod(self.dims)

    @property
    def ndims(self) -> int:
        return len(self.dims)

    # --- shared expression templates (valid Spark SQL *and* DuckDB SQL) ---

    def _axis_index_expr(self, axis: int, id_col: str = "cell_id") -> str:
        """1-based per-axis index from the column-major linear id."""
        stride = prod(self.dims[:axis])
        n = self.dims[axis]
        if stride == 1:
            e = f"({id_col} % {n})"
        else:
            # floor(a/b) over doubles is exact for ids < 2^53 and parses
            # identically in Spark SQL and DuckDB (no shared `div` operator).
            e = f"((CAST(floor({id_col} / {stride}) AS BIGINT)) % {n})"
        return f"({e} + 1)"

    def centroid_expr(self, axis: int, id_col: str = "cell_id") -> str:
        idx = self._axis_index_expr(axis, id_col)
        o, s = self.origin[axis], self.spacing[axis]
        return f"({o!r} + (CAST({idx} AS DOUBLE) - 0.5) * {s!r})"

    def select_exprs(self, id_col: str = "cell_id") -> list[str]:
        out = [f"{id_col}"]
        for a in range(self.ndims):
            out.append(f"{self.centroid_expr(a, id_col)} AS c{AXES[a]}")
        return out

    # --- engine-specific realizations ---

    def spark_df(
        self, spark: SparkSession, id_col: str = "cell_id",
        scramble: bool = False, num_partitions: int | None = None,
    ) -> DataFrame:
        """``scramble=True`` maps range ids through a bijective stride
        permutation (id·p mod n, gcd(p, n)=1) so each partition holds a
        spatially balanced mix of cells — kills partition skew from
        spatially clustered work (hot tiles / cheap poles) as a pure
        projection, no shuffle.  The result SET is identical."""
        df = (
            spark.range(self.ncells, numPartitions=num_partitions)
            if num_partitions
            else spark.range(self.ncells)
        )
        if scramble and self.ncells > 1:
            # permute BLOCKS of contiguous cells, not single cells: tasks
            # stay load-balanced across space, but each task still holds
            # contiguous runs so bucket-grouped kernels keep dense groups
            B = min(1024, self.ncells)
            nblocks = self.ncells // B
            p = 2654435761
            from math import gcd

            while nblocks > 1 and gcd(p, nblocks) != 1:
                p += 2
            if nblocks > 1:
                df = df.selectExpr(
                    f"CASE WHEN id < {nblocks * B} THEN "
                    f"((CAST(floor(id / {B}) AS BIGINT) * {p}) % {nblocks}) * {B} "
                    f"+ (id % {B}) ELSE id END AS id"
                )
        df = df.withColumnRenamed("id", id_col)
        return df.selectExpr(*self.select_exprs(id_col))

    def centroids_np(self, ids):
        """Vectorized numpy centroids for an array of linear cell ids —
        the same arithmetic (and FP op order) as `centroid_expr`."""
        import numpy as np

        ids = np.asarray(ids, dtype=np.int64)
        cols = []
        for a in range(self.ndims):
            stride = prod(self.dims[:a])
            idx = (ids // stride) % self.dims[a] + 1
            o, s = self.origin[a], self.spacing[a]
            cols.append(o + (idx.astype(np.float64) - 0.5) * s)
        return np.column_stack(cols)

    def duck_sql(self, id_col: str = "cell_id") -> str:
        """DuckDB relation producing the identical grid table."""
        inner = f"SELECT range AS {id_col} FROM range({self.ncells})"
        cols = ", ".join(self.select_exprs(id_col))
        return f"(SELECT {cols} FROM ({inner}))"

    def snap_cell_expr(self, coord_cols: tuple[str, ...], id_col: str = "cell_id") -> str:
        """Inverse-grid arithmetic: nearest cell linear id for a point —
        realizes the reference's nearest-1 snap (``src/simulation/fft.jl:131-133``)
        as a projection, no join needed on regular grids."""
        terms = []
        for a, c in enumerate(coord_cols):
            o, s, n = self.origin[a], self.spacing[a], self.dims[a]
            i0 = (
                f"least(CAST({n - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
                f"CAST(floor(({c} - {o!r}) / {s!r}) AS BIGINT)))"
            )
            stride = prod(self.dims[:a])
            terms.append(f"({i0}) * {stride}")
        return "(" + " + ".join(terms) + ")"
