"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All delimiter/length-arithmetic based so the
same semantics evaluate bit-identically on Spark and DuckDB (regex
dialects diverge; ``replace``/``length``/``ascii`` do not).
"""

from __future__ import annotations

FP_PRIME = 1_000_000_007
FP_BASE = 31


def token_count_expr(text: str = "text") -> str:
    return f"(length({text}) - length(replace({text}, ' ', '')) + 1)"


def phrase_count_expr(text: str, word: str) -> str:
    # double every internal space first: adjacent occurrences ('the the')
    # share a delimiter space, and non-overlapping replace would count
    # only one of them — after doubling, each ' w ' occurrence owns its
    # delimiters.  A multi-word needle must have ITS internal spaces
    # doubled too, to match the transformed text.
    needle = word.replace(" ", "  ")
    pad = f"' ' || replace({text}, ' ', '  ') || ' '"
    return (
        f"CAST((length({pad}) - length(replace({pad}, ' {needle} ', ''))) "
        f"/ {len(needle) + 2} AS BIGINT)"
    )


def fingerprint_expr(text: str = "text", n: int = 32) -> str:
    """Polynomial rolling hash of the first ``n`` bytes (Karp-Rabin form,
    precomputed powers mod p) — an order-sensitive content fingerprint,
    unlike md5-of-whole-text it supports prefix/rolling comparison."""
    terms = []
    p = 1
    for i in range(1, n + 1):
        terms.append(
            f"(CAST(ascii(substr({text}, {i}, 1)) AS BIGINT) * {p} % {FP_PRIME})"
        )
        p = (p * FP_BASE) % FP_PRIME
    s = " + ".join(terms)
    return f"(({s}) % {FP_PRIME})"


LANGID_MARKERS = {
    "en": ["the", "and"], "de": ["der", "und"],
    "fr": ["le", "et"], "es": ["el", "y"],
}


def langid_score_cols(text: str = "text") -> str:
    """``s_<lang>`` marker-count columns (one per language)."""
    return ", ".join(
        "(" + " + ".join(phrase_count_expr(text, w) for w in ws)
        + f") AS s_{l}"
        for l, ws in LANGID_MARKERS.items()
    )


def langid_best_expr() -> str:
    """Deterministic argmax over the ``s_*`` columns (first-wins ties,
    marker-dict order — both engines evaluate the CASE identically)."""
    return (
        "CASE "
        "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END"
    )


def quality_ok_expr(text: str = "text") -> str:
    """The heuristic keep/drop gate shared by the text_quality entry and
    the curation pipeline: ≥50 whitespace tokens and ≥200 bytes."""
    toks = token_count_expr(text)
    return (
        f"CASE WHEN {toks} >= 50 AND length({text}) >= 200 "
        f"THEN 1 ELSE 0 END"
    )


def langid_sql(docs_rel: str = "documents") -> str:
    return (
        f"SELECT doc_id, {langid_best_expr()} AS pred_lang, "
        f"s_en, s_de, s_fr, s_es "
        f"FROM (SELECT doc_id, {langid_score_cols()} FROM {docs_rel}) _s"
    )


def redact_pii_sql(dialect: str, docs_rel: str = "documents") -> str:
    """PII scrubbing (cleaning pass): token-level redaction of
    email-shaped tokens ('%@%.%' → '<EMAIL>'), SSN-shaped tokens
    (digit-shape exactly '###-##-####' → '<SSN>'), IPv4-shaped tokens
    (digits+dots only, 3 dots, no empty octet, octets ≤ 3 digits →
    '<IP>'), and all-digit runs of ≥7 ('<PHONE>'), plus per-doc
    redaction counts.  Token arithmetic only — regex dialects diverge
    between engines; LIKE + translate() do not (the digit SHAPE comes
    from ``translate(t, '0123456789', '##########')``, so a date
    '2024-01-01' → '####-##-##' never matches the SSN shape and a
    version '1.2.3' fails the three-dot test).  PII is synthesized
    deterministically into the text (the corpus is synthetic and carries
    none), shared VERBATIM by entry and oracle so the OPERATOR is what
    both engines must agree on."""
    pii = (
        "(text || CASE WHEN doc_id % 11 = 0 "
        "THEN ' contact bob' || CAST(doc_id % 50 AS {str}) "
        "|| '@mail.example.com today' ELSE '' END "
        "|| CASE WHEN doc_id % 13 = 0 "
        "THEN ' call 555' || CAST(1000000 + doc_id AS {str}) || ' now' "
        "ELSE '' END "
        "|| CASE WHEN doc_id % 17 = 0 "
        "THEN ' ssn 078-05-' || CAST(1000 + doc_id % 9000 AS {str}) "
        "|| ' leaked' ELSE '' END "
        "|| CASE WHEN doc_id % 19 = 0 "
        "THEN ' host 10.' || CAST(doc_id % 256 AS {str}) || '.0.' "
        "|| CAST(doc_id % 250 AS {str}) || ' up' ELSE '' END)"
    ).format(str="STRING" if dialect == "spark" else "VARCHAR")
    shape = "translate(t, '0123456789', '##########')"
    is_email = "t LIKE '%@%.%'"
    is_ssn = f"{shape} = '###-##-####'"
    is_ipv4 = (
        "(translate(t, '0123456789', '') = '...' "
        "AND t NOT LIKE '.%' AND t NOT LIKE '%.' "
        "AND t NOT LIKE '%..%' "
        f"AND {shape} NOT LIKE '%####%')"
    )
    is_phone = (
        "(length(t) >= 7 AND t <> '' AND "
        "translate(t, '0123456789', '') = '')"
    )
    tok = (
        f"CASE WHEN {is_email} THEN '<EMAIL>' "
        f"WHEN {is_ssn} THEN '<SSN>' "
        f"WHEN {is_ipv4} THEN '<IP>' "
        f"WHEN {is_phone} THEN '<PHONE>' ELSE t END"
    )
    flag = (
        f"CASE WHEN {is_email} OR {is_ssn} OR {is_ipv4} OR {is_phone} "
        f"THEN 1 ELSE 0 END"
    )
    if dialect == "spark":
        red = f"array_join(transform(split(raw, ' '), t -> {tok}), ' ')"
        cnt = (f"aggregate(transform(split(raw, ' '), t -> {flag}), 0, "
               f"(a, x) -> a + x)")
    else:
        red = (f"array_to_string(list_transform(string_split(raw, ' '), "
               f"t -> {tok}), ' ')")
        cnt = (f"CAST(list_sum(list_transform(string_split(raw, ' '), "
               f"t -> {flag})) AS INTEGER)")
    return (
        f"SELECT doc_id, md5({red}) AS redacted_md5, {cnt} AS n_redacted "
        f"FROM (SELECT doc_id, {pii} AS raw FROM {docs_rel}) _p"
    )


def repetition_ratio_sql(dialect: str, docs_rel: str = "documents",
                         k: int = 2, round_to: int = 6) -> str:
    """Gopher-style repetition score: frequency of the most common
    ``k``-gram over all ``k``-grams of the document — boilerplate and
    generated spam score high, natural text low.  Shingle explode →
    per-(doc, gram) counts → max/sum per doc; the shuffle key is
    (doc_id, gram) so the plan scales with corpus size, never gram
    vocabulary."""
    from .dedup import shingles_duck, shingles_spark

    sh = (shingles_spark if dialect == "spark" else shingles_duck)("text", k)
    if dialect == "spark":
        ex = f"SELECT doc_id, explode({sh}) AS g FROM {docs_rel}"
    else:
        ex = f"SELECT doc_id, unnest({sh}) AS g FROM {docs_rel}"
    # LEFT JOIN from the corpus: a document with < k tokens has no
    # shingles and would otherwise vanish from the output entirely —
    # downstream joins that assume one-row-per-document would silently
    # neither pass nor fail it.  Short docs emit (NULL ratio, 0 grams).
    agg = (
        f"SELECT doc_id, "
        f"round(CAST(max(c) AS DOUBLE) / sum(c), {round_to}) + 0.0 "
        f"AS rep_ratio, CAST(sum(c) AS BIGINT) AS n_grams "
        f"FROM (SELECT doc_id, g, count(*) AS c FROM ({ex}) _e "
        f"GROUP BY doc_id, g) _c GROUP BY doc_id"
    )
    return (
        f"SELECT d.doc_id, _a.rep_ratio AS rep_ratio, "
        f"CAST(coalesce(_a.n_grams, 0) AS BIGINT) AS n_grams "
        f"FROM {docs_rel} d LEFT JOIN ({agg}) _a ON d.doc_id = _a.doc_id"
    )


def _char_class_expr(text: str) -> str:
    """Map every character to its class tag: letters → 'a', digits →
    '0', spaces stay ' ', everything else untouched (each punctuation
    mark is its own class — BPE-style pre-tokenizers split between
    punctuation marks too).  translate-only: regex dialects diverge
    between engines, translate does not."""
    letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    return (
        f"translate({text}, '{letters}0123456789', "
        f"'{'a' * 52}{'0' * 10}')"
    )


def subword_token_count_sql(dialect: str,
                            docs_rel: str = "documents") -> str:
    """BPE-ish subword token count (the brief's 'whitespace + BPE-ish'
    pair; `token_count_expr` is the whitespace tier): tokens are maximal
    runs of same-class characters (letter-run, digit-run, single
    punctuation), so ``"abc123 def-ghi"`` counts abc|123|def|-|ghi = 5 —
    the class-transition segmentation BPE pre-tokenizers approximate
    with regex, here computed regex-free from the class string.

    A run STARTS at position i iff class(i) ≠ ' ' and (i = 1 or
    class(i-1) ≠ class(i) or class(i) is punctuation — adjacent
    punctuation marks are separate tokens).  One position-explode + one
    aggregation (the fast LATERAL form); LEFT JOIN keeps empty docs at
    0 (the one-row-per-document coverage contract)."""
    cls = _char_class_expr("text")
    if dialect == "spark":
        ex = (
            f"SELECT doc_id, substring(_c, pos, 1) AS c, "
            f"CASE WHEN pos = 1 THEN ' ' "
            f"ELSE substring(_c, pos - 1, 1) END AS p "
            f"FROM (SELECT doc_id, {cls} AS _c FROM {docs_rel}) _t "
            f"LATERAL VIEW explode(CASE WHEN length(_c) >= 1 THEN "
            f"sequence(1, length(_c)) ELSE array() END) _e AS pos"
        )
    else:
        ex = (
            f"SELECT doc_id, _c[pos:pos] AS c, "
            f"CASE WHEN pos = 1 THEN ' ' ELSE _c[pos-1:pos-1] END AS p "
            f"FROM (SELECT doc_id, {cls} AS _c FROM {docs_rel}) _t, "
            f"LATERAL (SELECT unnest(generate_series(1, "
            f"greatest(1, length(_c)))) AS pos) _e "
            f"WHERE length(_c) >= 1"
        )
    starts = (
        "CASE WHEN c <> ' ' AND (p <> c OR c NOT IN ('a', '0')) "
        "THEN 1 ELSE 0 END"
    )
    agg = (
        f"SELECT doc_id, CAST(sum({starts}) AS BIGINT) AS n_subwords "
        f"FROM ({ex}) _x GROUP BY doc_id"
    )
    return (
        f"SELECT d.doc_id, CAST(coalesce(_a.n_subwords, 0) AS BIGINT) "
        f"AS n_subwords "
        f"FROM {docs_rel} d LEFT JOIN ({agg}) _a ON d.doc_id = _a.doc_id"
    )
