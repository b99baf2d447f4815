"""Character-trigram Naive-Bayes language identification — a TRAINED
model, not a marker-word heuristic (which `textstats.langid_sql` remains,
as the cheap projection-only tier).

Public technique (character n-gram NB text categorization, Cavnar &
Trenkle 1994 lineage): per-language trigram log-probabilities with
Laplace smoothing, document score = log prior + Σ log p(trigram | lang),
prediction = argmax.  Everything — training AND scoring — is expressed
in portable SQL over the corpus, so the DuckDB oracle runs the identical
computation and the gate compares hash-exactly:

* counts are exact integer aggregations (identical on both engines);
* log-probabilities are quantized to integer MICRO-UNITS
  (``CAST(round(ln(p) * 1e6) AS BIGINT)``) so per-document scores are
  BIGINT sums — order-independent, no floating accumulation to diverge
  between engines (one ``ln`` per distinct (lang, trigram), not per
  occurrence);
* DuckDB's ``sum(BIGINT) → HUGEINT`` is cast back to BIGINT on both
  sides (schema parity);
* argmax tie-breaks deterministically: highest score, then
  lexicographically smallest language
  (``ROW_NUMBER() OVER (... ORDER BY score_micro DESC, lang)``).

Scale shape: the model is a bounded ``(lang × vocab)`` relation (trigram
vocabulary saturates in the tens of thousands per script) — at 100 TB it
broadcasts against the exploded trigram-occurrence stream; the
occurrence explode and both aggregations are ordinary shuffles keyed on
(lang, trigram) / (doc_id, lang), AQE-splittable, no driver
materialization.

Why the engine ships BOTH tiers: the heuristic scores a row with zero
joins (projection-only — the right tool inside a quality-filter scan);
the trained model is the real classifier.  On the synthetic testdata
corpus the ``lang`` label is text-independent (documented in SURVEY §6),
so accuracy there is meaningless by construction — the REALISM evidence
is `tests/test_webtext.py::test_langid_model_accuracy`, which trains on
a held-out split of a deterministic multi-script corpus and asserts
≥ 0.95 held-out accuracy; the GATE entry anchors cross-engine exactness
of the full train + score pipeline.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

_VIEW_SEQ = itertools.count()


def trigrams_spark(text: str = "text") -> str:
    # CASE guard mirrors dedup.shingles_spark: sequence(1, 0) is the
    # DESCENDING [1, 0] in Spark, and substring over it would fabricate
    # trigrams for sub-3-char docs
    return (
        f"CASE WHEN length({text}) >= 3 THEN "
        f"transform(sequence(1, length({text}) - 2), "
        f"i -> substring({text}, i, 3)) "
        f"ELSE array() END"
    )


def trigrams_duck(text: str = "text") -> str:
    return (
        f"list_transform(generate_series(1, greatest(0, length({text}) - 2)), "
        f"i -> {text}[i:i+2])"
    )


def _explode(dialect: str, list_expr: str, alias: str) -> str:
    if dialect == "spark":
        return f"explode({list_expr}) AS {alias}"
    return f"unnest({list_expr}) AS {alias}"


def langid_model_sql(dialect: str, train_rel: str = "documents",
                     score_rel: str | None = None,
                     tgt_rel: str | None = None) -> str:
    """One self-contained query: train on ``train_rel`` (doc_id, text,
    lang), score every ``score_rel`` document (defaults to the training
    corpus, the exactness-gate shape) → (doc_id, pred_lang, score_micro).

    Sub-3-char documents yield no trigrams; the LEFT JOIN from the score
    corpus keeps them (one row per input document — the coverage
    contract every per-doc operator here honours), scored by prior
    alone.  A language whose every training doc is sub-3-char has no
    trigram statistics and drops out of the candidate set.

    ``tgt_rel``: optional pre-materialized (lang, tg) trigram-occurrence
    relation — the training explode feeds FOUR aggregations and Spark
    re-inlines CTEs, so the `langid_model` wrapper persists it once and
    passes the view name here (values identical either way; the DuckDB
    oracle keeps the inline CTE, which DuckDB evaluates once)."""
    score_rel = score_rel or train_rel
    tg = (trigrams_spark if dialect == "spark" else trigrams_duck)("text")
    tgt_src = (
        f"SELECT lang, tg FROM {tgt_rel}" if tgt_rel else
        f"SELECT lang, {_explode(dialect, tg, 'tg')} FROM {train_rel}"
    )
    return f"""
WITH _tgt AS (
  {tgt_src}
), _tot AS (
  SELECT lang, count(*) AS n FROM _tgt GROUP BY lang
), _voc AS (
  SELECT count(DISTINCT tg) AS v FROM _tgt
), _cnt AS (
  SELECT lang, tg, count(*) AS c FROM _tgt GROUP BY lang, tg
), _model AS (
  SELECT c.lang, c.tg,
         CAST(round(ln((c.c + 1.0) / (t.n + v.v)) * 1000000) AS BIGINT)
           AS lp
  FROM _cnt c JOIN _tot t ON c.lang = t.lang CROSS JOIN _voc v
), _floor AS (
  SELECT t.lang,
         CAST(round(ln(1.0 / (t.n + v.v)) * 1000000) AS BIGINT) AS lp0,
         CAST(round(ln(d.nd / td.td) * 1000000) AS BIGINT) AS pr
  FROM _tot t
  JOIN (SELECT lang, CAST(count(*) AS DOUBLE) AS nd
        FROM {train_rel} GROUP BY lang) d ON t.lang = d.lang
  CROSS JOIN _voc v
  CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS td
              FROM {train_rel}) td
), _tgs AS (
  SELECT doc_id, {_explode(dialect, tg, 'tg')} FROM {score_rel}
), _scores AS (
  SELECT g.doc_id, f.lang,
         f.pr + CAST(coalesce(sum(coalesce(m.lp, f.lp0)), 0) AS BIGINT)
           AS score_micro
  FROM _tgs g
  CROSS JOIN _floor f
  LEFT JOIN _model m ON m.lang = f.lang AND m.tg = g.tg
  GROUP BY g.doc_id, f.lang, f.pr
), _full AS (
  SELECT d.doc_id, f.lang, coalesce(s.score_micro, f.pr) AS score_micro
  FROM (SELECT doc_id FROM {score_rel}) d
  CROSS JOIN _floor f
  LEFT JOIN _scores s ON s.doc_id = d.doc_id AND s.lang = f.lang
), _ranked AS (
  SELECT doc_id, lang, score_micro,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_micro DESC, lang) AS rk
  FROM _full
)
SELECT doc_id, lang AS pred_lang, score_micro FROM _ranked WHERE rk = 1"""


# one live trigram persist per application (same bounded-cache pattern
# as similarity._LAST_BUCKETS); entries (SparkSession, DataFrame)
_LAST_TGT: dict = {}
_TGT_LOCK = __import__("threading").Lock()


def langid_model(spark, train_df: DataFrame,
                 score_df: DataFrame | None = None) -> DataFrame:
    """Library wrapper: train on ``train_df`` (doc_id, text, lang), score
    ``score_df`` (defaults to the training corpus).  Materializes the
    exploded training-trigram relation once (persisted temp view) — it
    feeds four aggregations and Spark re-inlines CTEs — bounded to one
    live persist per application."""
    seq = next(_VIEW_SEQ)
    trel, srel = f"_lm_train_{seq}", f"_lm_score_{seq}"
    tgt_rel = f"_lm_tgt_{seq}"
    train_df.createOrReplaceTempView(trel)
    (score_df if score_df is not None else train_df) \
        .createOrReplaceTempView(srel)
    tgt = spark.sql(
        f"SELECT lang, {_explode('spark', trigrams_spark('text'), 'tg')} "
        f"FROM {trel}"
    )
    tgt.persist().createOrReplaceTempView(tgt_rel)
    app = spark.sparkContext.applicationId
    with _TGT_LOCK:
        prev = _LAST_TGT.get(app)
        if prev is not None:
            try:
                prev[1].unpersist()
            except Exception:
                pass
        _LAST_TGT[app] = (spark, tgt)
    out = spark.sql(langid_model_sql("spark", trel, srel, tgt_rel=tgt_rel))
    # spark.sql resolves views eagerly at analysis, so dropping them now
    # is safe and keeps the catalog from accumulating one trio per call
    for v in (trel, srel, tgt_rel):
        spark.catalog.dropTempView(v)
    return out
