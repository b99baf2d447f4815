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


def langid_sql(docs_rel: str = "documents") -> str:
    markers = {
        "en": ["the", "and"], "de": ["der", "und"],
        "fr": ["le", "et"], "es": ["el", "y"],
    }
    sc_cols = ", ".join(
        "(" + " + ".join(phrase_count_expr("text", w) for w in ws) + f") AS s_{l}"
        for l, ws in markers.items()
    )
    best = (
        "CASE "
        "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END"
    )
    return (
        f"SELECT doc_id, {best} AS pred_lang, s_en, s_de, s_fr, s_es "
        f"FROM (SELECT doc_id, {sc_cols} FROM {docs_rel}) _s"
    )
