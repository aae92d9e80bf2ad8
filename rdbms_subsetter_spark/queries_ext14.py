"""Graded queries, part 14 (round 3 batch): real JDBC round-trip over
embedded Derby.

Same contract as queries_core: identical aliases both sides, floats
rounded both sides, no array/map outputs (driver canonicalizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.sources.io import jdbc_roundtrip

# ---------------------------------------------------------------------------
# JDBC source/sink round-trip (embedded Derby — on every Spark classpath)
# ---------------------------------------------------------------------------


def q_jdbc_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JDBC sink (batched INSERTs into embedded Derby) →
    range-partitioned JDBC scan (8 splits on the numeric PK) →
    aggregate.  The reference is RDBMS→RDBMS end to end
    (`subsetter.py::Db.__init__`, `create_row_in` insert); this entry
    proves our JDBC path against a REAL SQL engine — Derby ships on
    Spark's classpath, so the sink and the partitioned source both
    execute everywhere Spark runs.  The oracle reads the original
    parquet: any value lost or mangled by the SQL type system breaks
    the hash.

    Scale shape: writes are batched (one round-trip per 10k rows, not
    per row); the read is a partitioned range scan on the PK — the only
    acceptable JDBC-extract shape at scale (a single-connection scan
    serializes the whole table through one socket).
    """
    cat = Catalog(spark, sf_dir)
    sup = cat["supplier"]
    rt = jdbc_roundtrip(
        sup, f"{sf_dir}/supplier", "supplier", partition_column="s_suppkey"
    )
    return rt.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("sum_bal"),
        F.min("s_suppkey").alias("min_key"),
        F.max("s_suppkey").alias("max_key"),
    )


_SQL_JDBC_SOURCE = """
SELECT s_nationkey, count(*) AS n_supp,
       round(sum(s_acctbal), 2) AS sum_bal,
       min(s_suppkey) AS min_key, max(s_suppkey) AS max_key
FROM supplier
GROUP BY s_nationkey
"""


# ---------------------------------------------------------------------------
# Literal-fixture oracle twins for the rows-only operators
# ---------------------------------------------------------------------------
#
# graph_pagerank and dedup_semdedup are iterative / kmeans-seeded and not
# SQL-expressible on the real tables, so their sf-data entries are graded
# rows-only.  These twins run the SAME operator code on a small literal
# fixture whose expected output is derived INDEPENDENTLY (numpy power
# iteration / brute-force cosine mirror — the derivations live in
# tests/test_operators.py and tools/fixture_expectations.py) and graded
# through the full driver hash gate via a literal-VALUES oracle.  The
# scale-shaped implementations stay untouched; this closes the
# correctness gap without weakening their 100 TB design.

_PR_EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (2, 4)]
# numpy power iteration, 12 iterations, damping 0.85, dangling node 4
# redistributed; agreement with the operator is 1e-12, rounding margin
# at 8 dp is >3e-9 (tools/fixture_expectations.py)
_PR_EXPECT = [
    (0, 0.23346052), (1, 0.16421609), (2, 0.33149840),
    (3, 0.06499540), (4, 0.20582959),
]


def q_graph_pagerank_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on a fixed 5-node graph (hub, chain, dangling node) —
    the hash-graded twin of the rows-only ``graph_pagerank`` entry.
    Exercises the identical driver-loop operator (dangling-mass
    redistribution, batched checkpoints); the oracle is the
    numpy-derived closed power iteration, so any drift in the iteration
    math, damping, or mass accounting breaks the hash."""
    from rdbms_subsetter_spark.operators import graph

    edges = spark.createDataFrame(_PR_EDGES, "src long, dst long")
    ranks = graph.pagerank(edges, iterations=12, damping=0.85)
    return ranks.select("node", F.round("rank", 8).alias("rank"))


_SQL_PAGERANK_FIXTURE = "SELECT * FROM (VALUES {vals}) AS t(node, rank)".format(
    vals=", ".join(
        f"(CAST({n} AS BIGINT), CAST({r!r} AS DOUBLE))" for n, r in _PR_EXPECT
    )
)

# 12 vectors in 4-d: three well-separated direction clusters, each with
# a known near-duplicate structure (brute-force float32-cosine mirror in
# tools/fixture_expectations.py): cell of +y keeps 3 (one exact dup),
# +z keeps 1 (all four mutually >= 0.95), +x keeps 2 (two exact dups)
_SD_VECS = [
    (0, [10.0, 0.2, 0.1, 0.0]), (1, [10.1, 0.2, 0.1, 0.0]),
    (2, [9.9, 0.21, 0.1, 0.0]), (3, [8.0, 3.0, 0.0, 0.0]),
    (4, [0.1, 12.0, 0.3, 0.0]), (5, [0.1, 12.1, 0.3, 0.0]),
    (6, [0.0, 9.0, 4.0, 0.0]), (7, [3.0, 9.0, 0.0, 2.0]),
    (8, [0.0, 0.1, 11.0, 0.2]), (9, [0.3, 0.0, 10.0, 3.0]),
    (10, [0.0, 2.0, 9.0, 0.0]), (11, [1.0, 0.0, 10.5, 0.1]),
]
_SD_EXPECT = [(0, 4, 3), (1, 4, 1), (2, 4, 2)]


def q_dedup_semdedup_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup on a fixed 12-vector corpus — the hash-graded twin of
    the rows-only ``dedup_semdedup`` entry.  Runs the identical
    operator (driver-side Lloyd k-means fit, Arrow-batched unit-vector
    assignment, intra-cell pair join, arithmetic summary); the oracle
    is the independently computed brute-force keep count per cell."""
    from rdbms_subsetter_spark.operators import similarity

    emb = spark.createDataFrame(
        _SD_VECS, "vec_id long, embedding array<float>"
    )
    return similarity.semdedup(emb, n_clusters=3, threshold=0.95, seed=42)


_SQL_SEMDEDUP_FIXTURE = "SELECT * FROM (VALUES {vals}) AS t(cell, n_vectors, n_kept)".format(
    vals=", ".join(
        f"(CAST({c} AS INT), CAST({n} AS BIGINT), CAST({k} AS BIGINT))"
        for c, n, k in _SD_EXPECT
    )
)


def ext14_queries() -> dict:
    return {
        "jdbc_source_agg": q_jdbc_source_agg,
        "graph_pagerank_fixture": q_graph_pagerank_fixture,
        "dedup_semdedup_fixture": q_dedup_semdedup_fixture,
    }


def ext14_oracles() -> dict:
    return {
        "jdbc_source_agg": _SQL_JDBC_SOURCE,
        "graph_pagerank_fixture": _SQL_PAGERANK_FIXTURE,
        "dedup_semdedup_fixture": _SQL_SEMDEDUP_FIXTURE,
    }
