"""MinHash-LSH dedup at scale (companion to ann_stress.py — the r2
verdict's parameter-realism softness, band side).

Synthesizes N deterministic documents JVM-side (40 words from a 5,000-token
vocabulary via integer mixing; every id % 100 == 0 is id-1's text plus one
appended word → planted near-dup pairs with 3-shingle Jaccard ≈ 0.9), then
runs the COMPOSED production pipeline `dedup_verified_sql` (128-hash
signatures → 32×4 banding → per-(band, key) candidate join → exact full-set
Jaccard verify) and reports wall, candidate/verified counts, and planted
recall.

Usage: python tools/dedup_stress.py [N]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
WORDS = 40
VOCAB = 5_000


def main():
    from geostatssolvers_jl_spark.session import get_spark
    from geostatssolvers_jl_spark.webtext.dedup import (
        dedup_verified_sql, lsh_candidates128_sql, minhash128_sig_cte,
    )

    spark = get_spark("dedup-stress", master="local[32]")
    base = "CASE WHEN id % 100 = 0 AND id > 0 THEN id - 1 ELSE id END"
    # bilinear mix (per-doc hash × per-position hash, mod a prime then the
    # vocab): a LINEAR word sequence makes every document a translate of
    # one arithmetic progression — half the corpus becomes accidental
    # near-dups of the other half
    mix1 = f"(({base} * 2654435761 + 12345) % 999983)"
    word = (
        f"concat('w', CAST((({mix1} * (pos * 40503 + 771)) % 1000003) "
        f"% {VOCAB} AS STRING))"
    )
    text = (
        f"concat(concat_ws(' ', transform(sequence(1, {WORDS}), "
        f"pos -> {word})), "
        f"CASE WHEN id % 100 = 0 AND id > 0 "
        f"THEN concat(' x', CAST(id % 97 AS STRING)) ELSE '' END)"
    )
    spark.range(N).selectExpr(
        "id AS doc_id", f"{text} AS text"
    ).createOrReplaceTempView("docs_stress")

    # materialize the 128-hash signature once (Spark inlines CTEs — the
    # band self-join would otherwise compute it twice; same fix as the
    # gate entries)
    sig = spark.sql(minhash128_sig_cte("spark", "docs_stress"))
    sig.cache().count()
    sig.createOrReplaceTempView("sig_stress")

    t0 = time.time()
    ncand = spark.sql(
        "SELECT count(*) AS n FROM ("
        + lsh_candidates128_sql("spark", "docs_stress", sig_rel="sig_stress")
        + ") _c"
    ).collect()[0]["n"]
    t_cand = time.time() - t0

    t0 = time.time()
    ver = spark.sql(
        "SELECT doc_a, doc_b FROM ("
        + dedup_verified_sql(
            "spark", "docs_stress", threshold=0.5, sig_rel="sig_stress"
        )
        + ") _v"
    )
    ver.cache()
    nver = ver.count()
    t_ver = time.time() - t0
    planted = spark.sql(
        f"SELECT id - 1 AS doc_a, id AS doc_b FROM range({N}) "
        f"WHERE id % 100 = 0 AND id > 0"
    )
    npl = planted.count()
    hit = ver.join(planted, ["doc_a", "doc_b"], "semi").count()
    spark.stop()
    print(json.dumps({
        "n_docs": N, "words_per_doc": WORDS, "vocab": VOCAB,
        "n_hashes": 128, "bands": "32x4",
        "candidate_pairs": ncand,
        "candidate_sec": round(t_cand, 1),
        "verified_pairs_j50": nver,
        "verify_sec": round(t_ver, 1),
        "planted_pairs": npl,
        "planted_recall": round(hit / max(npl, 1), 4),
    }))


if __name__ == "__main__":
    main()
