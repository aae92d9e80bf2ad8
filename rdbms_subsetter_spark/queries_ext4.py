"""Extension battery 4: recursive SQL, modern aggregate surface,
LATERAL joins, and corpus repetition-quality signals.

Highlights of this batch:

- ``sql_recursive_cte`` expresses the reference's FK-closure reachability
  (subsetter.py::Db.create_row_in parent recursion) declaratively as ANSI
  ``WITH RECURSIVE`` — Spark 4 executes it as an iterative union plan,
  DuckDB as a recursive CTE; the SAME SQL text runs on both engines.
- ``agg_listagg`` / ``agg_argminmax`` cover the ordered-string-agg and
  arg-extremum aggregate surface (listagg WITHIN GROUP, max_by/min_by,
  count_if) that classic engines expose.
- ``sql_lateral_topk`` is the per-group top-k of the reference's capped
  child pull (subsetter.py::create_row_in child half) in its SQL-native
  LATERAL form, complementing the window-function form in child_topk.
- ``text_repetition_ngrams`` is a Gopher-style repetition quality signal
  (duplicate-trigram fraction) for LLM corpus curation, computed with
  JVM-side higher-order array functions — no Python UDF in the hot path.

Oracle discipline (see SURVEY.md §5): every column aliased identically on
both sides; floats rounded with the engines' SQL half-up round on BOTH
sides; deterministic ordering keys (unique tiebreaks) everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.queries_ext import _shingle_cte

# near-dup pair graph at Jaccard >= 0.5 — the same derivation proven by
# dedup_ngram_jaccard / dedup_cc_clusters parity (queries_ext3)
_PAIRS_CTE = f"""{_shingle_cte(3)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT d1, d2
  FROM shared JOIN sizes n1 ON d1 = n1.doc_id JOIN sizes n2 ON d2 = n2.doc_id
  WHERE shared * 1.0 / (n1.n_sh + n2.n_sh - shared) >= 0.5)"""

# ---------------------------------------------------------------------------
# recursive CTE — FK reachability as declarative SQL
# ---------------------------------------------------------------------------

# One SQL text, two engines. Node ids are namespaced strings so the
# heterogeneous FK hierarchy region<-nation<-customer<-orders becomes a
# single edge list; depth counts are the closure frontier sizes.
# Spark 4 compiles the recursion into an iterative UnionLoop plan —
# the declarative twin of closure.py's semi-join fixpoint; each level is
# one shuffle join against the (small, reusable) edge relation.
_RECURSIVE_CTE_SQL = """
WITH RECURSIVE
edges(node, parent) AS (
  SELECT 'n' || CAST(n_nationkey AS STRING), 'r' || CAST(n_regionkey AS STRING) FROM nation
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS STRING), 'n' || CAST(c_nationkey AS STRING) FROM customer
  UNION ALL
  SELECT 'o' || CAST(o_orderkey AS STRING), 'c' || CAST(o_custkey AS STRING) FROM orders
),
reach(node, depth) AS (
  SELECT 'r' || CAST(r_regionkey AS STRING), 0 FROM region
  UNION ALL
  SELECT e.node, r.depth + 1 FROM edges e JOIN reach r ON e.parent = r.node
)
SELECT depth, count(*) AS n_nodes FROM reach GROUP BY depth
"""


def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-graph reachability from region roots via ANSI WITH RECURSIVE
    (Spark 4 recursive CTE): per-depth node counts of the
    region<-nation<-customer<-orders hierarchy. Declarative form of the
    reference's recursive parent closure (subsetter.py::create_row_in)."""
    cat = Catalog(spark, sf_dir)
    for t in ("region", "nation", "customer", "orders"):
        cat[t].createOrReplaceTempView(t)
    return spark.sql(_RECURSIVE_CTE_SQL)


# ---------------------------------------------------------------------------
# modern aggregate surface
# ---------------------------------------------------------------------------


def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg WITHIN GROUP / string_agg) +
    median: per market segment, the sorted distinct order priorities as
    one CSV string and the median order value. Interpolated median
    (percentile_cont) differs across engines in the last ulp — enough to
    flip a round(2) at the half-cent boundary — so the discrete median
    (percentile_disc: ANSI smallest value with cume_dist >= 0.5) is used;
    it returns an actual data value, bit-identical on both engines."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["orders"]
        .join(cat["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.expr(
                "listagg(DISTINCT o_orderpriority, ',') "
                "WITHIN GROUP (ORDER BY o_orderpriority)"
            ).alias("priorities"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("median_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extremum + conditional-count aggregates: per nation, the
    customer names at min/max custkey (unique ordering key -> fully
    deterministic, no tie ambiguity) and the count of positive-balance
    customers (count_if / FILTER clause)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["customer"]
        .groupBy("c_nationkey")
        .agg(
            F.max_by("c_name", "c_custkey").alias("newest_cust"),
            F.min_by("c_name", "c_custkey").alias("oldest_cust"),
            F.count_if(F.col("c_acctbal") > 0).alias("n_positive"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


# ---------------------------------------------------------------------------
# LATERAL join
# ---------------------------------------------------------------------------

# Same SQL text on both engines. The LATERAL subquery is the SQL-native
# form of the reference's per-parent capped child pull; Spark plans the
# correlated ORDER BY .. LIMIT as a lateral join with a per-row local
# top-k (no global shuffle of customer).
_LATERAL_TOPK_SQL = """
SELECT n.n_name, l.c_name, l.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) l
"""


def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via correlated LATERAL subquery (ORDER BY + LIMIT
    inside the lateral): top-2 customers by balance per nation, custkey
    tiebreak. SQL twin of child_topk's window form (reference op #10)."""
    cat = Catalog(spark, sf_dir)
    for t in ("nation", "customer"):
        cat[t].createOrReplaceTempView(t)
    return spark.sql(_LATERAL_TOPK_SQL)


# ---------------------------------------------------------------------------
# corpus repetition quality (Gopher-style signal)
# ---------------------------------------------------------------------------


def q_text_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal for corpus curation: per document, the
    fraction of duplicate word trigrams (Gopher-style 'repeated n-gram'
    filter). All array work is JVM-side higher-order functions
    (transform/sequence/array_distinct) inside whole-stage codegen — no
    Python UDF, no shuffle (scan -> project -> filter only).

    Staged through projections so the split array and the trigram array
    are each materialized ONCE per row: codegen does not CSE higher-order
    lambdas, and referencing `tri` N times in one select re-builds the
    whole array N times (same lesson as operators/similarity.quantize_int8,
    measured 0.99->0.21 s there)."""
    cat = Catalog(spark, sf_dir)
    words = F.col("__w")
    # short-doc guard: sequence(1, 0) DESCENDS in Spark and would index
    # element_at(words, 0), which throws
    tri = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i),
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        cat["documents"]
        .select("doc_id", F.split(F.col("text"), " ").alias("__w"))
        .filter(F.size("__w") >= 3)
        .select("doc_id", tri.alias("__tri"))
        .select(
            "doc_id",
            F.size("__tri").alias("n_tri"),
            F.size(F.array_distinct("__tri")).alias("n_uniq"),
        )
        .select(
            "doc_id",
            "n_tri",
            "n_uniq",
            F.round(F.lit(1) - F.col("n_uniq") / F.col("n_tri"), 4).alias(
                "rep_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# graph + behavioral analytics
# ---------------------------------------------------------------------------


def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the near-dup similarity graph — the
    classic distributed wedge-join workload (edges (a<b) ⋈ (b<c) ⋈ (a,c)
    check).  Ordered node ids mean each triangle is enumerated exactly
    once; the edge list feeds three join sides, so it is materialized
    once (localCheckpoint) instead of re-running the similarity self-join
    per consumer.  At scale the wedge join shuffles on single node keys —
    degree skew is the risk, and the (a<b) orientation already halves the
    heaviest hubs' out-degree."""
    from rdbms_subsetter_spark.operators import dedup

    cat = Catalog(spark, sf_dir)
    e = (
        dedup.ngram_jaccard_pairs(cat["documents"], n=3, threshold=0.5)
        .select(F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b"))
        .localCheckpoint(eager=True)
    )
    tri = (
        e.join(
            e.select(F.col("a").alias("b"), F.col("b").alias("c")), on="b"
        )
        .join(
            e.select(F.col("a"), F.col("b").alias("c")), on=["a", "c"]
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): stage k counts
    users whose first click follows their first view, and whose first
    purchase follows that click.  Three aggregates all keyed on user_id
    — co-partitioned, so the two enrichment joins reuse the same hash
    partitioning (no extra shuffle of the big side at scale)."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, on="user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, on="user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        v.join(c, on="user_id", how="left")
        .join(p, on="user_id", how="left")
        .select(
            F.when(F.col("t2").isNotNull(), F.lit(3))
            .when(F.col("t1").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .alias("funnel_stage")
        )
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, distinct
    active users per (cohort_day, day_offset).  First-touch agg + one
    co-keyed join + distinct-agg — the standard product-analytics rollup,
    all on the user_id partitioning."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("cohort_day"))
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(first, on="user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# source connectors: XML, binaryFile, custom Python DataSource
# ---------------------------------------------------------------------------


def q_xml_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → XML (Spark 4 native XML source) → read back (explicit
    schema) → aggregate; the oracle reads the original parquet, so any
    markup round-trip loss or schema drift breaks the hash."""
    from rdbms_subsetter_spark.sources.io import xml_roundtrip

    cat = Catalog(spark, sf_dir)
    rt = xml_roundtrip(cat["part"], tag=f"{sf_dir}/part")
    return rt.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
        F.min("p_partkey").alias("min_key"),
        F.max("p_partkey").alias("max_key"),
    )


def q_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-object ingestion via the ``binaryFile`` source — how an
    image/audio corpus enters the engine at scale (one row per object:
    path/length/content).  Documents are materialized as .bin files,
    scanned back distributed, and fingerprinted (md5 + byte length)
    JVM-side; the oracle recomputes both from the original text column."""
    from rdbms_subsetter_spark.sources.io import binary_doc_fixture

    cat = Catalog(spark, sf_dir)
    d = binary_doc_fixture(cat["documents"], tag=f"{sf_dir}/documents")
    return spark.read.format("binaryFile").load(d).select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


def q_pysource_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``):
    partition-parallel deterministic generator — 8 partitions × 1000
    rows produced executor-side (no driver materialization), then a
    per-partition aggregate.  The value formula is pure integer/IEEE
    (multiples of 1/8), so sums are exact and order-independent and the
    DuckDB oracle reproduces them from generate_series bit-exactly."""
    from rdbms_subsetter_spark.sources.pysource import RangeGenDataSource

    # re-registration is a plain overwrite in PySpark 4 (verified: no
    # exception on double register), so no guard is needed
    spark.dataSource.register(RangeGenDataSource)
    df = (
        spark.read.format("rangegen")
        .option("partitions", 8)
        .option("rowsPerPartition", 1000)
        .load()
    )
    return df.groupBy("part").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 2).alias("sum_val"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# streaming: stream-stream join
# ---------------------------------------------------------------------------


def q_streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (clicks × purchases within
    1 hour, per user); bounded replay emits exactly the batch interval
    join → oracle-checked."""
    from rdbms_subsetter_spark.streaming import events as streaming_events

    return streaming_events.streaming_stream_join(spark, sf_dir)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def ext4_queries() -> dict:
    return {
        "sql_recursive_cte": q_sql_recursive_cte,
        "agg_listagg": q_agg_listagg,
        "agg_argminmax": q_agg_argminmax,
        "sql_lateral_topk": q_sql_lateral_topk,
        "text_repetition_ngrams": q_text_repetition_ngrams,
        "graph_triangle_count": q_graph_triangle_count,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "xml_source_agg": q_xml_source_agg,
        "binaryfile_source": q_binaryfile_source,
        "pysource_generate": q_pysource_generate,
        "streaming_stream_join": q_streaming_stream_join,
    }


def ext4_oracles() -> dict:
    return {
        "sql_recursive_cte": _RECURSIVE_CTE_SQL,
        "agg_listagg": """
SELECT c_mktsegment,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
        "agg_argminmax": """
SELECT c_nationkey,
       arg_max(c_name, c_custkey) AS newest_cust,
       arg_min(c_name, c_custkey) AS oldest_cust,
       count(*) FILTER (WHERE c_acctbal > 0) AS n_positive,
       count(*) AS n_cust
FROM customer GROUP BY c_nationkey
""",
        "sql_lateral_topk": _LATERAL_TOPK_SQL,
        "text_repetition_ngrams": """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
t AS (
  SELECT doc_id,
         list_transform(range(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS tri
  FROM w WHERE len(words) >= 3
)
SELECT doc_id,
       len(tri) AS n_tri,
       len(list_distinct(tri)) AS n_uniq,
       round(1 - len(list_distinct(tri)) / len(tri), 4) AS rep_frac
FROM t
""",
        "graph_triangle_count": f"""
WITH {_PAIRS_CTE},
tri AS (
  SELECT ab.d1 AS a, ab.d2 AS b, bc.d2 AS c
  FROM pairs ab
  JOIN pairs bc ON ab.d2 = bc.d1
  JOIN pairs ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2),
nodes AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT doc_id, count(*) AS n_triangles FROM nodes GROUP BY doc_id
""",
        "events_funnel": """
WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT CASE WHEN t2 IS NOT NULL THEN 3
            WHEN t1 IS NOT NULL THEN 2
            ELSE 1 END AS funnel_stage,
       count(*) AS n_users
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
GROUP BY 1
""",
        "events_retention": """
WITH first AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
               FROM events GROUP BY user_id),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT cohort_day,
       date_diff('day', cohort_day, day) AS day_offset,
       count(DISTINCT user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
""",
        "xml_source_agg": """
SELECT p_brand,
       count(*) AS n_parts,
       round(sum(p_retailprice), 2) AS sum_price,
       min(p_partkey) AS min_key,
       max(p_partkey) AS max_key
FROM part GROUP BY p_brand
""",
        "binaryfile_source": """
SELECT doc_id,
       strlen(text) AS n_bytes,
       md5(text) AS content_md5
FROM documents WHERE doc_id < 64
""",
        "pysource_generate": """
SELECT CAST(id // 1000 AS INT) AS part,
       count(*) AS n,
       round(sum((id * 7 % 1000) / 8.0), 2) AS sum_val,
       min(id) AS min_id,
       max(id) AS max_id
FROM (SELECT range AS id FROM range(0, 8000))
GROUP BY 1
""",
        "streaming_stream_join": """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
    }
