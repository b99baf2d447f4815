"""URL canonicalization, deterministic dataset splits, and benchmark-
contamination detection — the remaining normalization/partitioning
operators of a production training-data pipeline (dedup/similarity/
quality live in the sibling modules).

All builders emit SQL that parses in BOTH Spark SQL and DuckDB (the
engine/oracle twin contract): pure string arithmetic via
``instr``/``substr``/``lower`` — no regex (dialects diverge) — with a
dialect split only where the array functions are named differently
(``split``/``filter``/``array_join`` vs ``string_split``/``list_filter``/
``array_to_string``).
"""

from __future__ import annotations


def canonicalize_url_expr(dialect: str, u: str = "url") -> str:
    """Canonical form of ``u``: strip the fragment, lowercase the scheme
    and host (the path stays case-sensitive per RFC 3986), drop a
    trailing slash on a non-root path, and remove ``utm_*`` tracking
    query parameters while preserving the order of the rest.  Returns a
    single scalar expression (nested CASEs — no lateral column refs, so
    it composes into any projection)."""
    # strip fragment
    u1 = f"(CASE WHEN instr({u}, '#') > 0 THEN substr({u}, 1, instr({u}, '#') - 1) ELSE {u} END)"
    # base (pre-'?') and query tail
    base = f"(CASE WHEN instr({u1}, '?') > 0 THEN substr({u1}, 1, instr({u1}, '?') - 1) ELSE {u1} END)"
    q = f"(CASE WHEN instr({u1}, '?') > 0 THEN substr({u1}, instr({u1}, '?') + 1) ELSE '' END)"
    # lowercase scheme+host: host ends at the first '/' after '://'
    rel = f"substr({base}, instr({base}, '://') + 3)"
    b2 = (
        f"(CASE WHEN instr({rel}, '/') > 0 "
        f"THEN lower(substr({base}, 1, instr({base}, '://') + 2 + instr({rel}, '/') - 1)) "
        f"|| substr({base}, instr({base}, '://') + 2 + instr({rel}, '/')) "
        f"ELSE lower({base}) END)"
    )
    # drop ONE trailing slash when a path exists (never the host's own)
    rel2 = f"substr({b2}, instr({b2}, '://') + 3)"
    b3 = (
        f"(CASE WHEN substr({b2}, length({b2}), 1) = '/' "
        f"AND instr({rel2}, '/') > 0 AND instr({rel2}, '/') < length({rel2}) "
        f"THEN substr({b2}, 1, length({b2}) - 1) ELSE {b2} END)"
    )
    # filter utm_* params, order-preserving
    if dialect == "spark":
        fq = (
            f"array_join(filter(split({q}, '&'), "
            f"p -> p NOT LIKE 'utm!_%' ESCAPE '!'), '&')"
        )
    else:
        fq = (
            f"array_to_string(list_filter(string_split({q}, '&'), "
            f"p -> p NOT LIKE 'utm!_%' ESCAPE '!'), '&')"
        )
    return (
        f"(CASE WHEN {fq} <> '' THEN {b3} || '?' || {fq} ELSE {b3} END)"
    )


def synthesize_url_expr() -> str:
    """Deterministic messy url per document — mixed-case host, optional
    trailing slash, tracking params, fragment — shared VERBATIM by the
    entry and the oracle so `url_canonical` tests the OPERATOR, not the
    data (the corpus carries no url column).  Every url-shaping modulus
    (host %2, slash %2, params %5 via... all divide 100) is determined by
    doc_id % 100, so docs ≡ mod 100 canonicalize to ONE group — 500 docs
    → 100 groups of 5 at sf0.01 (verified)."""
    return (
        "('HTTPS://WWW.Example' || CAST(doc_id % 2 AS STRING) || '.COM/p' "
        "|| CAST(doc_id % 100 AS STRING) "
        "|| CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END "
        "|| CASE WHEN doc_id % 5 < 2 THEN '?utm_source=feed&utm_campaign=c' "
        "|| CAST(doc_id % 4 AS STRING) || '&ref=kept' "
        "WHEN doc_id % 5 = 2 THEN '?ref=kept&utm_medium=x' ELSE '' END "
        "|| CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)"
    )


def url_canonical_sql(dialect: str, docs_rel: str = "documents") -> str:
    """Canonical-url dedup groups: (canon_url, keep_doc, n_dups) — the
    standard crawl normalization pass (first-seen/min-id survivor per
    canonical url).  Emits every group, so the oracle checks both the
    canonicalization values and the survivor choice.

    LAYERED subqueries, one canonicalization step per level — the
    single-scalar `canonicalize_url_expr` substitutes each lower step's
    text several times per level, growing the expression exponentially
    (measured: 25 s of pure analysis/codegen on a 500-row input); the
    layered form computes each step once and analyzes instantly.  Values
    identical."""
    url = synthesize_url_expr()
    if dialect == "duck":
        url = url.replace("AS STRING", "AS VARCHAR")
    if dialect == "spark":
        fq = "array_join(filter(split(q, '&'), p -> p NOT LIKE 'utm!_%' ESCAPE '!'), '&')"
    else:
        fq = ("array_to_string(list_filter(string_split(q, '&'), "
              "p -> p NOT LIKE 'utm!_%' ESCAPE '!'), '&')")
    # INTEGER position columns between layers, not string intermediates:
    # Catalyst's project-collapse would re-substitute a duplicated string
    # expression at every use site (the naive nested form compiled for
    # 25 s, the string-layered form 8.7 s); duplicating a position
    # integer's small instr chain keeps the collapsed tree linear
    # (first-call analysis+codegen ≈ 1 s, warm < 1 s).
    return f"""
SELECT CASE WHEN fq <> '' THEN b3 || '?' || fq ELSE b3 END AS canon_url,
       min(doc_id) AS keep_doc, count(*) AS n_dups
FROM (
  SELECT doc_id, {fq} AS fq,
         CASE WHEN substr(b2, length(b2), 1) = '/' AND relp > 0
                   AND sep + 2 + relp < length(b2)
              THEN substr(b2, 1, length(b2) - 1) ELSE b2 END AS b3
  FROM (
    SELECT doc_id, q, relp, sep,
           CASE WHEN relp > 0
                THEN lower(substr(base, 1, sep + 2 + relp - 1))
                     || substr(base, sep + 2 + relp)
                ELSE lower(base) END AS b2
    FROM (
      SELECT doc_id, base, q,
             instr(base, '://') AS sep,
             instr(substr(base, instr(base, '://') + 3), '/') AS relp
      FROM (
        SELECT doc_id,
               CASE WHEN qp > 0 THEN substr(u1, 1, qp - 1) ELSE u1 END AS base,
               CASE WHEN qp > 0 THEN substr(u1, qp + 1) ELSE '' END AS q
        FROM (
          SELECT doc_id, u1, instr(u1, '?') AS qp
          FROM (
            SELECT doc_id,
                   CASE WHEN instr(u, '#') > 0
                        THEN substr(u, 1, instr(u, '#') - 1) ELSE u END AS u1
            FROM (SELECT doc_id, {url} AS u FROM {docs_rel}) _u0
          ) _u1
        ) _u1b
      ) _u2
    ) _u3
  ) _u4
) _u5
GROUP BY 1"""


def split_bucket_expr(dialect: str, id_expr: str = "doc_id") -> str:
    """md5-of-id bucket in [0, 100): the deterministic split key shared
    by ``split_assign_sql`` and the curation pipeline (stable under
    re-runs, partition-count changes, and corpus growth)."""
    if dialect == "spark":
        return (f"CAST(conv(substr(md5(CAST({id_expr} AS STRING)), 1, 4), "
                f"16, 10) AS BIGINT) % 100")
    return (f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 4)) "
            f"AS BIGINT) % 100")


def split_case_expr(bucket: str, train_pct: int = 98,
                    val_pct: int = 1) -> str:
    return (f"CASE WHEN {bucket} < {train_pct} THEN 'train' "
            f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' "
            f"ELSE 'test' END")


def split_assign_sql(dialect: str, docs_rel: str = "documents",
                     train_pct: int = 98, val_pct: int = 1) -> str:
    """Deterministic train/val/test assignment: md5-of-id bucket in
    [0, 100) → stable under re-runs, partition-count changes, and corpus
    growth (a doc's split never changes when other docs arrive) — the
    property random() splits lack.  Output (doc_id, bucket, split)."""
    b = split_bucket_expr(dialect)
    return (
        f"SELECT doc_id, {b} AS bucket, "
        f"{split_case_expr(b, train_pct, val_pct)} "
        f"AS split FROM {docs_rel}"
    )


def contamination_sql(dialect: str, docs_rel: str = "documents",
                      k: int = 3, min_shared: int = 5,
                      bench_mod: int = 97, bench_words: int = 10) -> str:
    """Benchmark-contamination scan: flag corpus documents sharing ≥
    ``min_shared`` distinct ``k``-gram shingles with any benchmark
    document.  The benchmark set is derived deterministically (first
    ``bench_words`` words of every doc_id ≡ 0 mod ``bench_mod`` —
    simulating eval-set leakage), so source docs flag themselves by
    construction, which is the correct semantics: they contain the
    benchmark text.  Join is shingle-equi (never doc×bench cross);
    at 10¹² docs the shuffle key is the shingle hash and the benchmark
    side broadcasts."""
    from .dedup import shingles_duck, shingles_spark

    sh = (shingles_spark if dialect == "spark" else shingles_duck)
    if dialect == "spark":
        head = (f"array_join(slice(split(text, ' '), 1, {bench_words}), ' ')")
        ex = "explode"
        doc_sh = f"SELECT doc_id, {ex}({sh('text', k)}) AS s FROM {docs_rel}"
        ben_sh = (
            f"SELECT doc_id AS bench_id, {ex}({sh('bt', k)}) AS s FROM "
            f"(SELECT doc_id, {head} AS bt FROM {docs_rel} "
            f"WHERE doc_id % {bench_mod} = 0) _b"
        )
    else:
        head = (f"array_to_string(list_slice(string_split(text, ' '), 1, "
                f"{bench_words}), ' ')")
        doc_sh = (f"SELECT doc_id, unnest({sh('text', k)}) AS s "
                  f"FROM {docs_rel}")
        ben_sh = (
            f"SELECT doc_id AS bench_id, unnest({sh('bt', k)}) AS s FROM "
            f"(SELECT doc_id, {head} AS bt FROM {docs_rel} "
            f"WHERE doc_id % {bench_mod} = 0) _b"
        )
    return (
        f"WITH _d AS (SELECT DISTINCT doc_id, s FROM ({doc_sh}) _x), "
        f"_e AS (SELECT DISTINCT bench_id, s FROM ({ben_sh}) _y) "
        f"SELECT _d.doc_id, _e.bench_id, "
        f"count(*) AS n_shared "
        f"FROM _d JOIN _e ON _d.s = _e.s "
        f"GROUP BY _d.doc_id, _e.bench_id "
        f"HAVING count(*) >= {min_shared}"
    )
