"""Connected components over near-duplicate pairs — duplicate CLUSTERS.

Pairwise dedup output (`dedup_verified_sql`, `dedup_embedding_lsh_sql`)
is not yet a dedup decision: if A~B and B~C, the three documents form ONE
cluster with ONE survivor, even when A~C never surfaced as a candidate
pair.  Production pipelines therefore run connected components over the
pair graph and keep min-id per component.

Spark realization: iterative min-label propagation as DataFrame joins —
Spark SQL has no recursive CTE, so the fixpoint loop IS the operator
(`connected_components`).  Each sweep sets
``label[v] ← min(label[v], min over neighbours u of label[u])`` and the
loop stops when a sweep changes nothing; convergence takes at most the
graph diameter sweeps (near-dup clusters are shallow — a handful), and
every sweep is one shuffle on ``dst`` + one on ``node``, both
AQE-splittable.  Lineage is cut with `localCheckpoint` every few sweeps
so long chains don't accumulate a deep recursive plan.

Oracle: DuckDB DOES have recursive CTEs, so the twin
(`components_oracle_sql`) computes the same labels by transitive-closure
min — a genuinely different algorithm arriving at the same fixpoint,
which is exactly what an oracle should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, a: str = "doc_a",
                         b: str = "doc_b", max_sweeps: int = 30,
                         checkpoint_every: int = 1) -> DataFrame:
    """(node, component) for every node in ``pairs`` — component = min
    node id of the connected component.  Deterministic (pure min over
    ids).  Raises if the fixpoint is not reached within ``max_sweeps``
    (diameter-bound; near-dup clusters converge in a handful).

    Result lifetime: the returned DataFrame is localCheckpointed (or
    persisted) — callers that are done with it should ``.unpersist()``
    it, or write it to storage; in a long-lived session the checkpoint
    blocks are unreplicated, so after an executor loss the result must
    be recomputed by re-running the operator (its lineage was cut by
    design).  Durable pipelines should land the labels via
    `lineage.commit_units` / a table write immediately.

    ``checkpoint_every=1`` is a measured default, not an oversight: the
    sweep body references the previous iteration three times, so without
    a per-sweep plan cut the logical plan QUADRUPLES per sweep and
    Catalyst re-analysis dominates within two sweeps (9.5 s of driver
    plan-build on a 25-pair toy graph).  ``persist`` caches data, not
    the plan, so "persist intermediates, checkpoint every few sweeps"
    does not help here.  Raise ``checkpoint_every`` only if driver
    memory for checkpoint blocks is the binding constraint."""
    # the union references `pairs` twice — persist so an expensive
    # upstream (the composed MinHash dedup) computes once, not twice
    pairs = pairs.persist()
    edges = (
        pairs.selectExpr(f"{a} AS src", f"{b} AS dst")
        .unionByName(pairs.selectExpr(f"{b} AS src", f"{a} AS dst"))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels.count()
    try:
        for sweep in range(max_sweeps):
            # min neighbour label per node, one shuffle per side
            neigh = (
                edges.join(
                    labels.withColumnRenamed("node", "src"), "src"
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("component").alias("nmin"))
            )
            prop = (
                labels.join(neigh, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nmin"), F.col("component")),
                    ).alias("component"),
                )
            )
            # pointer jumping: component ← component[component].  Labels
            # are node ids inside the component, so the composition is
            # well-defined and stays inside the component; with it, a
            # path's distance-to-min halves per sweep — O(log diameter)
            # sweeps instead of O(diameter) (a 100-link chain converges
            # in ~9 sweeps, not 101).
            jump = prop.selectExpr("node AS jn", "component AS jc")
            new = (
                prop.join(jump, prop.component == F.col("jn"), "left")
                .select(
                    "node",
                    F.coalesce(F.col("jc"), F.col("component"))
                    .alias("component"),
                )
            )
            if (sweep + 1) % checkpoint_every == 0:
                new = new.localCheckpoint()  # cut the recursive lineage
            else:
                new = new.persist()
            changed = (
                new.join(
                    labels.withColumnRenamed("component", "old"), "node"
                )
                .filter("component <> old")
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_sweeps} sweeps"
        )
    finally:
        edges.unpersist()
        pairs.unpersist()


def components_oracle_sql(pairs_sql: str, a: str = "doc_a",
                          b: str = "doc_b") -> str:
    """DuckDB twin: transitive closure by recursive CTE, component = min
    reachable node (UNION dedups rows, so the recursion terminates on
    cyclic graphs).  Only valid at oracle scale — closure is O(n·m) rows;
    the Spark side's label propagation is the scale path."""
    return f"""
WITH RECURSIVE _edges AS (
  SELECT {a} AS src, {b} AS dst FROM ({pairs_sql}) _p
  UNION
  SELECT {b} AS src, {a} AS dst FROM ({pairs_sql}) _p
), reach(node, other) AS (
  SELECT src, src FROM _edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN _edges e ON r.other = e.src
)
SELECT node, min(other) AS component FROM reach GROUP BY node"""
