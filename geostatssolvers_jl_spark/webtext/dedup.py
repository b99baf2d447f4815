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
    # CASE guard: documents with < k tokens must yield an EMPTY shingle
    # set — Spark's sequence(1, 0) is the DESCENDING [1, 0] (unlike
    # DuckDB's empty generate_series) and slice(toks, 0, k) then throws,
    # killing the whole dedup job on the first short/empty document
    toks = f"split({text}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> array_join(slice({toks}, i, {k}), ' ')) "
        f"ELSE array() END"
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
                      pair_pred: str = "a.doc_id < b.doc_id",
                      shingle_cap: int | None = None) -> str:
    """Exact shingle-set Jaccard for doc pairs (candidate verification).
    Output (doc_a, doc_b, jaccard) rounded to 6 dp.

    ``shingle_cap``: shingles occurring in more than this many documents
    (boilerplate — a shared footer shingle across 10⁶ docs explodes the
    pair join quadratically) are dropped from CANDIDATE GENERATION only;
    the exact intersection/Jaccard for surviving pairs still uses the FULL
    shingle sets, so reported values are unbiased."""
    sh = (shingles_spark if dialect == "spark" else shingles_duck)("text", k)
    ex = f"SELECT doc_id, {_explode(dialect, sh, 'sh')} FROM {docs_rel}"
    dist = f"SELECT DISTINCT doc_id, sh FROM ({ex}) _x"
    sizes = f"SELECT doc_id, count(*) AS n FROM ({dist}) _d GROUP BY doc_id"
    if shingle_cap is None:
        inter = (
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            f"FROM ({dist}) a JOIN ({dist}) b ON a.sh = b.sh AND {pair_pred} "
            f"GROUP BY a.doc_id, b.doc_id"
        )
        with_clauses = f"WITH _i AS ({inter}), _s AS ({sizes}) "
    else:
        cold = (
            f"SELECT doc_id, sh FROM _d WHERE sh IN "
            f"(SELECT sh FROM _d GROUP BY sh "
            f"HAVING count(*) <= {shingle_cap})"
        )
        cand = (
            f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            f"FROM _cold a JOIN _cold b ON a.sh = b.sh AND {pair_pred}"
        )
        inter = (
            f"SELECT c.doc_a, c.doc_b, count(*) AS i FROM _cand c "
            f"JOIN _d a ON a.doc_id = c.doc_a "
            f"JOIN _d b ON b.doc_id = c.doc_b AND b.sh = a.sh "
            f"GROUP BY c.doc_a, c.doc_b"
        )
        with_clauses = (
            f"WITH _d AS ({dist}), _cold AS ({cold}), _cand AS ({cand}), "
            f"_i AS ({inter}), _s AS ({sizes}) "
        )
    return (
        with_clauses
        + f"SELECT doc_a, doc_b, "
        f"round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard "
        f"FROM _i JOIN _s sa ON _i.doc_a = sa.doc_id "
        f"JOIN _s sb ON _i.doc_b = sb.doc_id "
        f"WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold!r}"
    )


def dedup_verified_sql(dialect: str, docs_rel: str = "documents",
                       k: int = 3, threshold: float = 0.5,
                       sig_rel: str | None = None) -> str:
    """The COMPOSED dedup pipeline: production MinHash-LSH candidate pairs
    → exact full-set Jaccard verification → near-duplicate pairs above
    ``threshold``.  This is the operator a training-data pipeline actually
    runs at scale: the pair join only ever materializes per (band, key)
    bucket, and the exact verify touches candidates only.
    Output (doc_a, doc_b, jaccard, n_shared_bands)."""
    cand = lsh_candidates128_sql(dialect, docs_rel, k, sig_rel=sig_rel)
    sh = (shingles_spark if dialect == "spark" else shingles_duck)("text", k)
    ex = f"SELECT doc_id, {_explode(dialect, sh, 'sh')} FROM {docs_rel}"
    dist = f"SELECT DISTINCT doc_id, sh FROM ({ex}) _x"
    sizes = f"SELECT doc_id, count(*) AS n FROM ({dist}) _d GROUP BY doc_id"
    inter = (
        f"SELECT c.doc_a, c.doc_b, max(c.n_shared_bands) AS nsb, "
        f"count(*) AS i FROM _vcand c "
        f"JOIN _vd a ON a.doc_id = c.doc_a "
        f"JOIN _vd b ON b.doc_id = c.doc_b AND b.sh = a.sh "
        f"GROUP BY c.doc_a, c.doc_b"
    )
    return (
        f"WITH _vcand AS ({cand}), _vd AS ({dist}), _vs AS ({sizes}), "
        f"_vi AS ({inter}) "
        f"SELECT doc_a, doc_b, "
        f"round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard, "
        f"nsb AS n_shared_bands "
        f"FROM _vi JOIN _vs sa ON _vi.doc_a = sa.doc_id "
        f"JOIN _vs sb ON _vi.doc_b = sb.doc_id "
        f"WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold!r}"
    )


# ---------------------------------------------------- production MinHash

N_HASHES_PROD = 128
BANDS_PROD = 32   # 32 bands × 4 rows — LSH threshold (1/32)^(1/4) ≈ 0.42
MH_PRIME = 2147483647


def _mh_params(i: int) -> tuple[int, int]:
    """Deterministic affine-map coefficients for hash i (nonzero a)."""
    a = (2654435761 * (i + 1) + 97) % MH_PRIME
    if a == 0:
        a = 1
    b = (40503 * (i + 1) + 12345) % MH_PRIME
    return a, b


def _base_hash(dialect: str) -> str:
    """One 60-bit md5-derived integer per shingle, reduced mod p — both
    engines parse the identical hex substring, so values match exactly."""
    if dialect == "spark":
        h = "CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT)"
    else:
        h = "CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT)"
    return f"({h} % {MH_PRIME})"


def minhash128_sig_cte(dialect: str, docs_rel: str = "documents",
                       k: int = 3, n_hashes: int = N_HASHES_PROD) -> str:
    """Wide production signature: one md5 per DISTINCT (doc, shingle), then
    ``n_hashes`` affine maps (aᵢ·h+bᵢ) mod p aggregated with min — ~100×
    cheaper per shingle than n_hashes separate md5 calls, and a single
    narrow shuffle on doc_id.  Returns SQL producing (doc_id, m0..m{n-1})."""
    sh = (shingles_spark if dialect == "spark" else shingles_duck)("text", k)
    ex = f"SELECT doc_id, {_explode(dialect, sh, 'sh')} FROM {docs_rel}"
    base = (
        f"SELECT DISTINCT doc_id, {_base_hash(dialect)} AS h "
        f"FROM ({ex}) _e"
    )
    mins = ", ".join(
        f"min(({a} * h + {b}) % {MH_PRIME}) AS m{i}"
        for i, (a, b) in ((i, _mh_params(i)) for i in range(n_hashes))
    )
    return f"SELECT doc_id, {mins} FROM ({base}) _h GROUP BY doc_id"


def _band_key(band: int, rows: int) -> str:
    """Fold the band's ``rows`` minhash values into one bigint key:
    iterated (key·31 + mᵢ) mod p — equality of the fold is the standard
    band-hash stand-in for equality of all rows (no giant string concats,
    no array dialect split)."""
    key = f"m{band * rows}"
    for r in range(1, rows):
        key = f"(({key}) * 31 + m{band * rows + r}) % {MH_PRIME}"
    return f"({key})"


def minhash128_sig_kernel(spark, docs_df, k: int = 3,
                          n_hashes: int = N_HASHES_PROD):
    """``(doc_id, m0..m{n-1})`` — kernel twin of `minhash128_sig_cte`
    (r7 second session): the SQL build (shingle explode → md5 →
    DISTINCT shuffle → 128 min-aggregates) measured ~23 s one-time at
    the sf1.0 shape (hidden from per-query min-of-N but fully in the
    bench wall); the kernel computes the identical rows in one narrow
    pass.

    Exactness is by construction, not FP replay — every step is
    integer/byte arithmetic with one canonical answer: Python's
    ``hashlib.md5`` over the shingle's UTF-8 bytes equals Spark's
    ``md5()``; the first 15 hex digits parse to the same 60-bit BIGINT;
    the affine maps and mods are int64 with no overflow
    (a, b, h < 2³¹ ⇒ a·h + b < 2⁶²); and min() is order-free.  Per-doc
    DISTINCT is a set of the derived h values (exactly the SQL's
    DISTINCT (doc_id, h)); docs with no shingles (< k tokens, NULL
    text) emit no row, matching the SQL's empty explode.  Pinned
    against the SQL by tests/test_webtext.py."""
    import hashlib

    import numpy as np
    import pandas as pd

    A = np.empty(n_hashes, dtype=np.int64)
    B = np.empty(n_hashes, dtype=np.int64)
    for i in range(n_hashes):
        A[i], B[i] = _mh_params(i)
    cols = ["doc_id"] + [f"m{i}" for i in range(n_hashes)]
    schema = ", ".join(f"{c} long" for c in cols)

    def fn(batches):
        md5 = hashlib.md5
        for b in batches:
            ids, hs, counts = [], [], []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                if text is None:
                    continue
                toks = text.split(" ")
                if len(toks) < k:
                    continue
                seen = {
                    int(md5(" ".join(toks[i:i + k]).encode("utf-8"))
                        .hexdigest()[:15], 16) % MH_PRIME
                    for i in range(len(toks) - k + 1)
                }
                ids.append(doc_id)
                counts.append(len(seen))
                hs.extend(seen)
            if not ids:
                yield pd.DataFrame({c: pd.Series(dtype="int64")
                                    for c in cols})
                continue
            H = np.asarray(hs, dtype=np.int64)
            starts = np.concatenate(
                ([0], np.cumsum(counts)[:-1])).astype(np.int64)
            sig = np.empty((len(ids), n_hashes), dtype=np.int64)
            # hash-function blocks bound the (|H| × block) intermediate
            # to ~tens of MB however many shingles a batch holds
            blk = 16
            for j in range(0, n_hashes, blk):
                M = (H[:, None] * A[None, j:j + blk]
                     + B[None, j:j + blk]) % MH_PRIME
                sig[:, j:j + blk] = np.minimum.reduceat(M, starts, axis=0)
            out = {"doc_id": np.asarray(ids, dtype=np.int64)}
            for i in range(n_hashes):
                out[f"m{i}"] = sig[:, i]
            yield pd.DataFrame(out)

    return docs_df.select("doc_id", "text").mapInPandas(fn, schema)


def minhash_bands_sql(dialect: str, docs_rel: str = "documents",
                      k: int = 3, n_hashes: int = N_HASHES_PROD,
                      bands: int = BANDS_PROD,
                      sig_rel: str | None = None) -> str:
    """(doc_id, band, key) long-form production banding — the LSH shuffle
    key at scale is (band, key).

    ``sig_rel``: name of a PRE-MATERIALIZED signature relation.  Spark
    inlines CTEs, so without it the 128 min-aggregates would re-run once
    per band arm; callers on the Spark side should materialize
    `minhash128_sig_cte` (cached view) and pass its name.  DuckDB callers
    can leave it None (one CTE)."""
    rows = n_hashes // bands
    if sig_rel is None:
        sig = minhash128_sig_cte(dialect, docs_rel, k, n_hashes)
        prefix, rel = f"WITH _sig AS ({sig}) ", "_sig"
    else:
        prefix, rel = "", sig_rel
    if dialect == "spark":
        # ONE scan + generate, not a `bands`-way UNION ALL: each union arm
        # is its own scan + codegen stage, and 32 scans of even a cached
        # signature table cost ~3 s of pure task/compile overhead at sf0.1
        # (measured; the explode form is ~10x cheaper and scales as one
        # pass over the signatures).  Values are identical — only the
        # plan shape differs — so the DuckDB twin keeps the portable
        # UNION ALL spelling.
        structs = ", ".join(
            f"struct({b} AS band, {_band_key(b, rows)} AS key)"
            for b in range(bands)
        )
        return prefix + (
            f"SELECT doc_id, _bk.band AS band, _bk.key AS key FROM "
            f"(SELECT doc_id, explode(array({structs})) AS _bk FROM {rel}) _x"
        )
    selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_key(b, rows)} AS key FROM {rel}"
        for b in range(bands)
    )
    return prefix + selects


def lsh_candidates128_sql(dialect: str, docs_rel: str = "documents",
                          k: int = 3, n_hashes: int = N_HASHES_PROD,
                          bands: int = BANDS_PROD,
                          sig_rel: str | None = None) -> str:
    """Production-shape candidate pairs: docs sharing ≥1 of ``bands`` band
    keys.  Pairs only materialize per (band, key) bucket — never globally.
    Output (doc_a, doc_b, n_shared_bands), doc_a < doc_b.
    ``sig_rel`` as in `minhash_bands_sql`."""
    if sig_rel is None:
        sig = minhash128_sig_cte(dialect, docs_rel, k, n_hashes)
        bands_body = minhash_bands_sql(
            dialect, docs_rel, k, n_hashes, bands, sig_rel="_sig"
        )
        prefix = f"WITH _sig AS ({sig}), _bands AS ({bands_body}) "
    else:
        bands_body = minhash_bands_sql(
            dialect, docs_rel, k, n_hashes, bands, sig_rel=sig_rel
        )
        prefix = f"WITH _bands AS ({bands_body}) "
    return (
        prefix
        + f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"count(*) AS n_shared_bands "
        f"FROM _bands a JOIN _bands b ON a.band = b.band AND a.key = b.key "
        f"AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id"
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


def dup_span_sql(dialect: str, docs_rel: str = "documents",
                 L: int = 30, min_count: int = 2) -> str:
    """Duplicate-SUBSTRING detection (per-doc summary) — the span-level
    rung of the dedup ladder below document-level MinHash: find every
    position whose L-char window occurs >= ``min_count`` times in the
    corpus (any document, any offset — self-repetition counts), merge
    overlapping/adjacent windows per document into maximal spans, and
    report ``(doc_id, n_dup_spans, dup_chars)`` for every document
    (LEFT JOIN keeps clean/short docs at 0 — the one-row-per-document
    coverage contract).

    This is the distributed shingle-hash approximation of
    suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): one position-explode
    scan, one shuffle keyed by the window text (a corpus-wide
    group-count — the scale cost; at 10^12 docs the group key would be
    a 64-bit hash of the window, same plan shape), one broadcast-able
    duplicate-window relation joined back, and a per-doc window merge
    (lag + running break-count island detection).  Windows have equal
    length, so spans merge exactly when the position gap <= L.
    """
    ctes = _dup_span_ctes(dialect, docs_rel, L, min_count)
    return f"""{ctes}, _per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         CAST(sum(e - s) AS BIGINT) AS dup_chars
  FROM _spans GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       coalesce(p.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
       coalesce(p.dup_chars, CAST(0 AS BIGINT)) AS dup_chars
FROM {docs_rel} d LEFT JOIN _per_doc p ON d.doc_id = p.doc_id"""


def dup_span_detail_sql(dialect: str, docs_rel: str = "documents",
                        L: int = 30, min_count: int = 2) -> str:
    """Span-level form of `dup_span_sql`: one row per merged duplicate
    span ``(doc_id, span_start, span_end)`` (1-based, end-exclusive) —
    the relation a span-REMOVAL pass consumes."""
    ctes = _dup_span_ctes(dialect, docs_rel, L, min_count)
    return f"""{ctes}
SELECT doc_id, s AS span_start, e AS span_end
FROM _spans"""


def _dup_span_ctes(dialect: str, docs_rel: str, L: int,
                   min_count: int) -> str:
    """Shared CTE chain through ``_spans`` (merged duplicate spans)."""
    if L < 2:
        raise ValueError("dup_span: window length L must be >= 2")
    if min_count < 2:
        raise ValueError("dup_span: min_count must be >= 2")
    npos = f"(length(text) - {L} + 1)"
    if dialect == "spark":
        ex = (
            f"SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
            f"substr(text, pos, {L}) AS sh "
            f"FROM {docs_rel} "
            f"LATERAL VIEW explode(CASE WHEN length(text) >= {L} THEN "
            f"sequence(1, {npos}) ELSE array() END) _e AS pos"
        )
    else:
        ex = (
            f"SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
            f"substr(text, CAST(pos AS INT), {L}) AS sh "
            f"FROM {docs_rel}, LATERAL (SELECT unnest(generate_series("
            f"1, greatest(0, {npos}))) AS pos) _e "
            f"WHERE length(text) >= {L}"
        )
    # the duplicate test is a window count on ONE pass of _pos —
    # a GROUP-BY-sh CTE joined back to _pos would be re-inlined by
    # Spark and run the explode scan TWICE (the engine's documented
    # CTE-inlining trap; same shuffle key either way)
    return f"""
WITH _pos AS (
  {ex}
), _hits AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           count(*) OVER (PARTITION BY sh) AS sh_n
    FROM _pos
  ) _w WHERE sh_n >= {int(min_count)}
), _brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
              ORDER BY pos) <= {L} THEN 0 ELSE 1 END AS brk
  FROM _hits
), _isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM _brk
), _spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + {L} AS e
  FROM _isl GROUP BY doc_id, island
)"""
