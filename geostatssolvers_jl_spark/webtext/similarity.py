"""Similarity search over embedding columns (engine addition).

* brute-force cosine top-k — exact baseline, fully declarative
  (``zip_with``/``aggregate`` JVM-side; no UDF);
* LSH-bucketed ANN — deterministic random-hyperplane signs bucket the
  vectors; search compares only within a bucket (and optionally its
  Hamming-1 neighbors).  The hyperplane weights are pure integer
  arithmetic of (plane, dim) so the oracle can rebuild them exactly.

At 10¹²-row scale the brute path is the per-bucket kernel and the bucket
key is the shuffle key; bucket skew is bounded by the number of planes.
"""

from __future__ import annotations

N_PLANES = 8
DIM = 64


def weight_expr(plane: int, d: int) -> str:
    """Deterministic hyperplane weight in [-0.5, 0.5): integer arithmetic
    identical in both engines."""
    return f"(CAST(({plane * 8191 + d * 131 + 7}) % 1000 AS DOUBLE) / 1000.0 - 0.5)"


def bucket_sql(dialect: str, emb_rel: str = "embeddings",
               n_planes: int = N_PLANES, dim: int = DIM) -> str:
    """(vec_id, bucket) — sign pattern of n_planes dot products."""
    if dialect == "spark":
        def dot(p):
            terms = " + ".join(
                f"CAST(embedding[{d}] AS DOUBLE) * {weight_expr(p, d)}"
                for d in range(dim)
            )
            return f"({terms})"
    else:
        def dot(p):
            terms = " + ".join(
                f"CAST(embedding[{d + 1}] AS DOUBLE) * {weight_expr(p, d)}"
                for d in range(dim)
            )
            return f"({terms})"
    packed = " + ".join(
        f"(CASE WHEN {dot(p)} >= 0.0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"SELECT vec_id, {packed} AS bucket FROM {emb_rel}"


def cosine_topk_spark(emb_view: str, k: int, query_pred: str = "q.vec_id < 20") -> str:
    """Brute-force cosine top-k (Spark dialect; oracle builds its own)."""
    dot = "aggregate(zip_with(q.e, d.e, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x)"
    nrm = (
        "sqrt(aggregate(zip_with(q.e, q.e, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x)) * "
        "sqrt(aggregate(zip_with(d.e, d.e, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x))"
    )
    inner = (
        f"SELECT q.vec_id AS qid, d.vec_id AS nid, "
        f"round(({dot}) / ({nrm}), 6) AS cos_sim "
        f"FROM {emb_view} q CROSS JOIN {emb_view} d "
        f"WHERE {query_pred} AND q.vec_id <> d.vec_id"
    )
    ranked = (
        f"SELECT *, row_number() OVER (PARTITION BY qid "
        f"ORDER BY cos_sim DESC, nid) AS rank FROM ({inner}) _i"
    )
    return f"SELECT qid, nid, cos_sim, rank FROM ({ranked}) _r WHERE rank <= {k}"
