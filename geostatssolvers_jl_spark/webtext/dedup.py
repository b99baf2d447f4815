"""Deduplication operators for web-scale text corpora.

Engine additions beyond the reference (training-data-pipeline ops):
exact-hash dedup, MinHash + LSH banding, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.  Every operator is expressed as
declarative SQL (whole-stage codegen, shuffle only at the groupBy keys)
in two dialects: Spark (`*_spark`) and DuckDB (`*_duck`) — the dialects
differ only in list-function spelling; hash values (md5 hex strings,
hex→int parses) are bit-identical, so the oracle checks values, not just
shapes.

Scale notes (10¹²-doc story):
* minhash signatures are one narrow shuffle keyed by band → the classic
  LSH layout; hot bands (boilerplate) are bounded by `band_cap`;
* candidate pairs only ever materialize per band bucket, never globally;
* exact-Jaccard verification runs on candidates only.
"""

from __future__ import annotations

N_HASHES = 8
BANDS = 4  # rows-per-band = N_HASHES // BANDS = 2


def shingles_spark(text: str, k: int = 3) -> str:
    toks = f"split({text}, ' ')"
    return (
        f"transform(sequence(1, greatest(0, size({toks}) - {k - 1})), "
        f"i -> array_join(slice({toks}, i, {k}), ' '))"
    )


def shingles_duck(text: str, k: int = 3) -> str:
    toks = f"string_split({text}, ' ')"
    return (
        f"list_transform(generate_series(1, greatest(0, len({toks}) - {k - 1})), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' '))"
    )


def _explode(dialect: str, list_expr: str, alias: str) -> str:
    if dialect == "spark":
        return f"explode({list_expr}) AS {alias}"
    return f"unnest({list_expr}) AS {alias}"


def minhash_signature_sql(dialect: str, docs_rel: str = "documents",
                          k: int = 3, n_hashes: int = N_HASHES) -> str:
    """(doc_id, h0..h{n-1}) — per-seed minimum of md5(shingle ∥ seed).
    md5-on-string is identical across engines, so signatures compare
    exactly."""
    sh = (shingles_spark if dialect == "spark" else shingles_duck)("text", k)
    exploded = (
        f"SELECT doc_id, {_explode(dialect, sh, 'sh')} FROM {docs_rel}"
    )
    mins = ", ".join(
        f"min(md5(sh || '_{i}')) AS h{i}" for i in range(n_hashes)
    )
    return f"SELECT doc_id, {mins} FROM ({exploded}) _e GROUP BY doc_id"


def lsh_candidates_sql(dialect: str, docs_rel: str = "documents",
                       k: int = 3, n_hashes: int = N_HASHES,
                       bands: int = BANDS) -> str:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band.
    Output (doc_a, doc_b, n_shared_bands), doc_a < doc_b."""
    rows = n_hashes // bands
    sig = minhash_signature_sql(dialect, docs_rel, k, n_hashes)
    band_exprs = []
    for b in range(bands):
        cols = " || '|' || ".join(f"h{b * rows + r}" for r in range(rows))
        band_exprs.append(f"SELECT doc_id, {b} AS band, {cols} AS key FROM _sig")
    bands_union = " UNION ALL ".join(band_exprs)
    return (
        f"WITH _sig AS ({sig}), _bands AS ({bands_union}) "
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"count(*) AS n_shared_bands "
        f"FROM _bands a JOIN _bands b ON a.band = b.band AND a.key = b.key "
        f"AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id"
    )


def ngram_jaccard_sql(dialect: str, docs_rel: str = "documents",
                      k: int = 3, threshold: float = 0.0,
                      pair_pred: str = "a.doc_id < b.doc_id") -> str:
    """Exact shingle-set Jaccard for doc pairs (candidate verification).
    Output (doc_a, doc_b, jaccard) rounded to 6 dp."""
    sh = (shingles_spark if dialect == "spark" else shingles_duck)("text", k)
    ex = f"SELECT doc_id, {_explode(dialect, sh, 'sh')} FROM {docs_rel}"
    dist = f"SELECT DISTINCT doc_id, sh FROM ({ex}) _x"
    sizes = f"SELECT doc_id, count(*) AS n FROM ({dist}) _d GROUP BY doc_id"
    inter = (
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
        f"FROM ({dist}) a JOIN ({dist}) b ON a.sh = b.sh AND {pair_pred} "
        f"GROUP BY a.doc_id, b.doc_id"
    )
    return (
        f"WITH _i AS ({inter}), _s AS ({sizes}) "
        f"SELECT doc_a, doc_b, "
        f"round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard "
        f"FROM _i JOIN _s sa ON _i.doc_a = sa.doc_id "
        f"JOIN _s sb ON _i.doc_b = sb.doc_id "
        f"WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold!r}"
    )


def simhash_sql(dialect: str, docs_rel: str = "documents",
                bits: int = 32) -> str:
    """(doc_id, simhash) — per-token 60-bit md5 hash; each output bit is the
    sign of the token-vote sum.  Engine parses hex via ``conv``; the oracle
    via DuckDB's '0x' cast — same integers."""
    if dialect == "spark":
        h = "CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"
    else:
        h = "CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)"
    if dialect == "spark":
        ex = f"SELECT doc_id, explode(split(text, ' ')) AS tok FROM {docs_rel}"
    else:
        ex = f"SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM {docs_rel}"
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return (
        f"WITH _t AS ({ex}), _h AS (SELECT doc_id, {h} AS h FROM _t), "
        f"_v AS (SELECT doc_id, {votes} FROM _h GROUP BY doc_id) "
        f"SELECT doc_id, {packed} AS simhash FROM _v"
    )
