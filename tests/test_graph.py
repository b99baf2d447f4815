"""PageRank (webtext.graph): cross-engine exactness of the micro-unit
algebra, DataFrame-loop ≡ unrolled-SQL parity, and ranking semantics
(authority concentration, teleport floor, mass bound)."""

from __future__ import annotations

import duckdb
import pytest

from geostatssolvers_jl_spark.webtext import graph as G

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df.createOrReplaceTempView("documents")
    return df


def test_pagerank_sql_cross_engine_exact(spark, docs):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF}/documents.parquet'")
    s = spark.sql(G.pagerank_sql("spark", iters=3)) \
        .orderBy("doc_id").collect()
    d = con.execute(G.pagerank_sql("duckdb", iters=3)
                    + " ORDER BY doc_id").fetchall()
    assert len(s) == len(d) == 500
    assert all((a["doc_id"], a["rank_micro"]) == (b[0], b[1])
               for a, b in zip(s, d))


def test_pagerank_dataframe_loop_equals_sql(spark, docs):
    """The persisted-loop production form computes the identical
    integer ranks as the unrolled portable SQL (same floors, same
    BIGINT sums)."""
    edges = spark.sql(G.synth_edges_sql("documents"))
    nodes = spark.sql("SELECT doc_id FROM documents")
    loop = {r["doc_id"]: r["rank_micro"]
            for r in G.pagerank(spark, edges, iters=5,
                                nodes_df=nodes).collect()}
    sql = {r["doc_id"]: r["rank_micro"]
           for r in spark.sql(G.pagerank_sql("spark", iters=5)).collect()}
    assert loop == sql


def test_pagerank_star_graph_semantics(spark):
    """Star graph: every node links to node 0 (plus a ring edge to keep
    out-degrees uniform) — node 0 must dominate; in-degree-0 nodes get
    exactly the teleport floor."""
    n = 20
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n)] + [(i, (i + 1) % n)
                                         for i in range(n)],
        "src long, dst long",
    )
    nodes = spark.range(n).selectExpr("id AS doc_id")
    ranks = {r["doc_id"]: r["rank_micro"]
             for r in G.pagerank(spark, edges, iters=8,
                                 nodes_df=nodes).collect()}
    top = max(ranks, key=ranks.get)
    assert top == 0
    assert ranks[0] > 5 * sorted(ranks.values())[len(ranks) // 2]
    # total mass bounded by n × scale, floor truncation only leaks
    assert 0.8 * n * 1_000_000 < sum(ranks.values()) <= n * 1_000_000


def test_pagerank_teleport_only_node(spark):
    """A node nobody links to holds exactly the teleport floor after
    any number of iterations."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0)], "src long, dst long")
    nodes = spark.range(3).selectExpr("id AS doc_id")
    # exact integer ranks after 5 iterations, from an independent
    # Python simulation of the micro-unit recurrence (r0 ↔ r1 exchange
    # mass in a damped ±0.85-eigenvalue oscillation; node 2 holds the
    # constant teleport 150000 at every step)
    ranks = {r["doc_id"]: r["rank_micro"]
             for r in G.pagerank(spark, edges, iters=5,
                                 nodes_df=nodes).collect()}
    assert ranks == {0: 1_663_323, 1: 1_186_675, 2: 150_000}


def test_pagerank_validation(spark):
    with pytest.raises(ValueError, match="iters"):
        G.pagerank_sql("spark", iters=0)
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        G.pagerank(spark, edges, iters=0)
    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty"):
        G.pagerank(spark, empty, iters=1)


def test_synth_edges_full_out_degree_no_self_links(spark, docs):
    e = spark.sql(G.synth_edges_sql("documents", out_degree=4))
    rows = e.collect()
    assert len(rows) == 500 * 4
    assert all(r["src"] != r["dst"] for r in rows)
    assert all(0 <= r["dst"] < 500 for r in rows)
