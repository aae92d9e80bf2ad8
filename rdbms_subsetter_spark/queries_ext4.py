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
    tri = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
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

    try:
        spark.dataSource.register(RangeGenDataSource)
    except Exception:
        pass  # already registered in this session
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
# registration
# ---------------------------------------------------------------------------


def ext4_queries() -> dict:
    return {
        "sql_recursive_cte": q_sql_recursive_cte,
        "agg_listagg": q_agg_listagg,
        "agg_argminmax": q_agg_argminmax,
        "sql_lateral_topk": q_sql_lateral_topk,
        "text_repetition_ngrams": q_text_repetition_ngrams,
        "xml_source_agg": q_xml_source_agg,
        "binaryfile_source": q_binaryfile_source,
        "pysource_generate": q_pysource_generate,
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
    }
