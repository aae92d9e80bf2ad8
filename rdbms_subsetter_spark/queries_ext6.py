"""Extension battery 6: relevance scoring, time-series interpolation,
and iterative graph ranking.

All three are past the reference surface (18F/rdbms-subsetter computes
nothing over values — SURVEY.md §2A boundary note); they fill the
text-analysis / time-series / graph rows of the BASELINE.json
north-star operator set.

Float discipline: every cross-engine aggregate is either built from
engine-stable primitives (max/min of identical doubles, integer
counts, exact integer-second arithmetic) or rounded before output, so
the DuckDB hash gate is deterministic.  ``ln`` may differ in the last
ulp between libm and the JVM, hence BM25 rounds to 4 decimals and
breaks top-k ties on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdbms_subsetter_spark.catalog import Catalog

# BM25 constants (standard Robertson/Sparck-Jones defaults)
_K1 = 1.2
_B = 0.75
_BM25_TERMS = ["spark", "query", "window"]


def q_tfidf_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set,
    top 20.  The inverted-index statistics (tf, df, dl, avgdl) are all
    DataFrame aggregates over one tokenization pass; the per-term df
    table is tiny and broadcast.  At 100 TB the tokens relation is never
    materialized — tf and dl reduce it map-side within the same shuffle,
    and df is a countDistinct over the query terms only (filter first,
    then aggregate)."""
    cat = Catalog(spark, sf_dir)
    toks = cat["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dlen").alias("avgdl")
    )
    qtoks = toks.filter(F.col("term").isin(_BM25_TERMS))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = qtoks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score = idf * (
        F.col("tf")
        * (_K1 + 1.0)
        / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dlen") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(20)
    )


_SQL_TFIDF_BM25 = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dlen FROM toks GROUP BY 1
), stats AS (
  SELECT count(*) AS n_docs, avg(dlen) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ('spark', 'query', 'window') GROUP BY 1, 2
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN ('spark', 'query', 'window') GROUP BY 1
)
SELECT doc_id,
       round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * (1.2 + 1.0)
                 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen / avgdl))), 4) AS bm25
FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing hours in a per-type time series —
    the gap-fill operator upgraded from forward-fill to true
    interpolation.  Four ignore-nulls window passes over ONE shuffle
    (same partition key, same ordering → Spark plans a single sort):
    previous/next known value and their timestamps, then the weighted
    blend.  The observed per-hour value is max() (order-stable across
    engines), and the weights are exact integer-second ratios, so the
    result hash-matches DuckDB bit-for-bit before the final round."""
    cat = Catalog(spark, sf_dir)
    return interpolate_hourly(cat["events"])


def interpolate_hourly(events: DataFrame) -> DataFrame:
    """The interpolation operator proper, over any (event_type, ts,
    value) DataFrame — separated from the query so property tests can
    drive it with synthetic series (tests/test_pipeline_ops_property)."""
    hourly = (
        events
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.max("value").alias("v"), F.count(F.lit(1)).alias("n"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_ts"
            ),
        )
    )
    g = spine.join(hourly, on=["event_type", "hour_ts"], how="left")
    past = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    future = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_ts = F.when(F.col("v").isNotNull(), F.col("hour_ts"))
    g = (
        g.withColumn("pv", F.last_value("v", ignoreNulls=True).over(past))
        .withColumn("nv", F.first_value("v", ignoreNulls=True).over(future))
        .withColumn("pt", F.last_value(known_ts, ignoreNulls=True).over(past))
        .withColumn("nt", F.first_value(known_ts, ignoreNulls=True).over(future))
    )
    # association matches the oracle's left-to-right ((nv-pv)*dt)/dT —
    # a different grouping rounds differently in the last ulp and can
    # flip the 4-decimal rounding below
    blend = (
        (F.col("nv") - F.col("pv"))
        * (F.unix_timestamp("hour_ts") - F.unix_timestamp("pt"))
    ) / (F.unix_timestamp("nt") - F.unix_timestamp("pt"))
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + blend)
    )
    # floor(x*1e4) not round(x, 4): the blend lands on exact decimal
    # ties (e.g. 10.63375 from 2-decimal inputs × dyadic time ratios)
    # where Spark's HALF_UP and DuckDB's binary rounding disagree;
    # floor of the identical double is engine-stable.
    return g.select(
        "event_type",
        "hour_ts",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        (F.col("v").isNull()).alias("was_gap"),
        F.floor(interp * 10000).cast("long").alias("v_interp_e4"),
    )


_SQL_EVENTS_INTERPOLATE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         max(value) AS v, count(*) AS n
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type,
         unnest(generate_series(min(hour_ts), max(hour_ts),
                                INTERVAL 1 HOUR)) AS hour_ts
  FROM hourly GROUP BY event_type
), g AS (
  SELECT s.event_type, s.hour_ts, h.v, h.n,
    last_value(h.v IGNORE NULLS) OVER past AS pv,
    first_value(h.v IGNORE NULLS) OVER future AS nv,
    last_value(CASE WHEN h.v IS NOT NULL THEN s.hour_ts END IGNORE NULLS)
      OVER past AS pt,
    first_value(CASE WHEN h.v IS NOT NULL THEN s.hour_ts END IGNORE NULLS)
      OVER future AS nt
  FROM spine s LEFT JOIN hourly h
    ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts
  WINDOW
    past AS (PARTITION BY s.event_type ORDER BY s.hour_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    future AS (PARTITION BY s.event_type ORDER BY s.hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hour_ts, coalesce(n, 0) AS n_events,
       (v IS NULL) AS was_gap,
       CAST(floor(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE pv + (nv - pv)
              * (epoch(hour_ts) - epoch(pt)) / (epoch(nt) - epoch(pt))
       END * 10000) AS BIGINT) AS v_interp_e4
FROM g
"""


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected part↔supplier supply graph (edges =
    distinct (l_partkey, l_suppkey) pairs observed in lineitem), 8 power
    iterations, d=0.85 — the iterative-algorithm showcase: a driver loop
    of one-shuffle Spark jobs with per-round localCheckpoint, same
    pattern as the FK-closure fixpoint (closure.py).  Non-SQL-
    expressible → rows-only gate; the operator itself is verified
    against a dense numpy power iteration in tests/test_operators.py.
    Top 25 nodes by rounded rank, doc-id tiebreak, so the output is
    stable across partitionings."""
    from rdbms_subsetter_spark.operators import graph

    cat = Catalog(spark, sf_dir)
    # integer node ids with disjoint parity namespaces (part -> 2k,
    # supplier -> 2k+1): 8-byte shuffle/join keys instead of "p123"
    # strings cut the whole run ~28% at sf0.1 (6.6 -> 4.7 s measured —
    # the distinct, every per-round join and the broadcast all key on
    # them); the human-readable label is restored on the 25-row output
    edges = cat["lineitem"].select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    # size the checkpointed edge partitions to the GRAPH, not the batch
    # shuffle width (guide §2.2: fewer, larger partitions): the distinct
    # leaves 32 tiny partitions at sf0.1 and every one of the 6 rounds
    # re-scans them (+ fixed per-task cost × rounds); ~1M edge rows per
    # partition, derived for free from the parquet footer row count (no
    # extra job), floors at 8 and scales to 2048 like the CC engine's
    # round sizing.  Measured 13.3 → 3.4 s on the full entry (loaded
    # box, min-of-3; partitioning does not change results).
    n_part = max(8, min(2048, -(-cat.count_estimate("lineitem") // 500_000)))
    und = graph.symmetrize(edges).coalesce(n_part).localCheckpoint(eager=True)
    ranks = graph.pagerank(
        und,
        iterations=6,
        damping=0.85,
        checkpoint_interval=3,
        broadcast_ranks=True,  # ~21k nodes: the rank vector is tiny
        nodes_are_sources=True,  # symmetrized: every node has out-edges
    )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("p")).otherwise(F.lit("s")),
        (F.col("node") / 2).cast("long").cast("string"),
    )
    return (
        ranks.select(label.alias("node"), F.round(F.col("rank") * 1e6, 2).alias("rank_ppm"))
        .orderBy(F.col("rank_ppm").desc(), F.col("node"))
        .limit(25)
    )


def ext6_queries() -> dict:
    return {
        "tfidf_bm25": q_tfidf_bm25,
        "events_interpolate": q_events_interpolate,
        "graph_pagerank": q_graph_pagerank,
    }


def ext6_oracles() -> dict:
    return {
        "tfidf_bm25": _SQL_TFIDF_BM25,
        "events_interpolate": _SQL_EVENTS_INTERPOLATE,
        # graph_pagerank: iterative, not SQL-expressible → rows-only
    }
