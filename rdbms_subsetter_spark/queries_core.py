"""Graded queries, part 1: the reference's own operator surface
(SURVEY.md §2A) — each paired with an ANSI-SQL oracle for the
driver's DuckDB hash gate.

Every computed column is aliased identically on both sides; float
aggregates are rounded on both sides so cross-engine summation-order
noise can't break the value hash.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import TPCH_TABLES, Catalog
from rdbms_subsetter_spark.closure import ClosureEngine
from rdbms_subsetter_spark.pipeline import subset_integrity, subset_summary
from rdbms_subsetter_spark.sampling import sample_modulo
from rdbms_subsetter_spark.writer import plan_preview
from rdbms_subsetter_spark.sampling import SamplePlan

# lineitem's total column order (the deterministic sort used wherever the
# reference sorted randomly) — parquet column order, no NULLs in testdata.
LI_COLS = (
    "l_orderkey,l_partkey,l_suppkey,l_linenumber,l_quantity,l_extendedprice,"
    "l_discount,l_tax,l_returnflag,l_linestatus,l_shipdate"
)

SINGLE_PK = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# The flagship subset as oracle CTEs (shared by several oracles).
SUBSET_CTES = f"""
seed_orders AS (SELECT * FROM orders WHERE o_orderkey % 20 = 0),
cust AS (SELECT * FROM customer WHERE c_custkey IN (SELECT o_custkey FROM seed_orders)),
li AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT l.*, row_number() OVER (PARTITION BY l_orderkey ORDER BY {LI_COLS}) AS rn
    FROM lineitem l
    WHERE l_orderkey IN (SELECT o_orderkey FROM seed_orders)
  ) WHERE rn <= 3),
prt AS (SELECT * FROM part WHERE p_partkey IN (SELECT l_partkey FROM li)),
sup AS (SELECT * FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM li)),
nat AS (SELECT * FROM nation WHERE n_nationkey IN
        (SELECT c_nationkey FROM cust UNION SELECT s_nationkey FROM sup)),
reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nat))
"""


# ---------------------------------------------------------------------------
# spark implementations
# ---------------------------------------------------------------------------


def q_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #2/#3: per-table row counts as one lazy union plan."""
    cat = Catalog(spark, sf_dir)
    parts = [
        cat[t].agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("table_name"), "n_rows"
        )
        for t in sorted(cat.tables())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #6: the reference's only predicate form — conjunctive equality."""
    cat = Catalog(spark, sf_dir)
    return cat["customer"].filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") == 5)
    )


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #7: ``_by_pk`` point lookup."""
    cat = Catalog(spark, sf_dir)
    return cat["orders"].filter(F.col("o_orderkey") == 42)


def q_anti_join_childless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #8 flavor: customers with no orders (left_anti — the set form
    of the reference's ``_exists`` check)."""
    cat = Catalog(spark, sf_dir)
    return cat["customer"].join(
        cat["orders"].select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
        how="left_anti",
    )


def q_semi_join_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #9 single step: nations that have at least one supplier."""
    cat = Catalog(spark, sf_dir)
    return cat["nation"].join(
        cat["supplier"].select(F.col("s_nationkey").alias("n_nationkey")),
        on="n_nationkey",
        how="left_semi",
    )


def q_child_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #10: capped child pull over every order — top-3 lineitems per
    order in the deterministic total order."""
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"]
    w = Window.partitionBy("l_orderkey").orderBy(*[F.col(c) for c in li.columns])
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


def q_sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #11 (deterministic form): 1/10 modulo sample of orders."""
    cat = Catalog(spark, sf_dir)
    return sample_modulo(cat["orders"], "o_orderkey", 10)


def q_sample_logarithmic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #12: logarithmic sizing ``n ** fraction`` (reference formula
    ``round(10 ** (log10(n) * f))``), deterministic pick: first n by PK."""
    cat = Catalog(spark, sf_dir)
    n = cat.count_estimate("orders")
    target = int(n**0.5 + 0.5)  # half-up, matching SQL round()
    return cat["orders"].orderBy("o_orderkey").limit(target)


def q_forced_rows_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #14: --force seed rows + their full parent closure."""
    cat = Catalog(spark, sf_dir)
    eng = ClosureEngine(cat)
    seed = cat["orders"].filter(F.col("o_orderkey").isin([1, 2, 3]))
    keys = eng.close_parents({"orders": seed.select("o_orderkey")})
    parts = [
        eng.rows_for_keys(t, k)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("table_name"), "n_rows")
        for t, k in sorted(keys.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def q_sequence_resync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #17: max(pk) per single-column-PK table — the setval() report."""
    cat = Catalog(spark, sf_dir)
    parts = [
        cat[t]
        .agg(F.max(F.col(pk).cast("long")).alias("max_pk"))
        .select(F.lit(t).alias("table_name"), "max_pk")
        for t, pk in sorted(SINGLE_PK.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def q_plan_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #18: the confirm-report — per-table source rows and both
    sizing targets at fraction 0.1 / log 0.5 (counts from parquet
    footers, no scan)."""
    cat = Catalog(spark, sf_dir)
    rows = []
    for t in sorted(cat.tables()):
        n = cat.count_estimate(t)
        rows.append((t, n, int(n * 0.1), int(n**0.5 + 0.5)))
    return spark.createDataFrame(
        rows, "table_name string, source_rows long, target_fraction long, target_log long"
    )


def q_schema_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #1/#19: reflected schema as data — (table, column, position)."""
    cat = Catalog(spark, sf_dir)
    rows = [
        (t, f.name, i)
        for t in sorted(cat.tables())
        for i, f in enumerate(cat[t].schema.fields)
    ]
    return spark.createDataFrame(rows, "table_name string, column_name string, position int")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def _row_counts_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}"
        for t in sorted(TPCH_TABLES)
    )


def _seq_resync_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, CAST(max({pk}) AS BIGINT) AS max_pk FROM {t}"
        for t, pk in sorted(SINGLE_PK.items())
    )


def _plan_preview_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, count(*) AS source_rows, "
        f"CAST(floor(count(*) * 0.1) AS BIGINT) AS target_fraction, "
        f"CAST(round(pow(count(*), 0.5), 0) AS BIGINT) AS target_log FROM {t}"
        for t in sorted(TPCH_TABLES)
    )


def core_queries() -> dict:
    return {
        "subset_summary": subset_summary,
        "subset_integrity": subset_integrity,
        "row_counts": q_row_counts,
        "filter_eq": q_filter_eq,
        "point_lookup": q_point_lookup,
        "anti_join_childless": q_anti_join_childless,
        "semi_join_parents": q_semi_join_parents,
        "child_topk": q_child_topk,
        "sample_fraction": q_sample_fraction,
        "sample_logarithmic": q_sample_logarithmic,
        "forced_rows_closure": q_forced_rows_closure,
        "sequence_resync": q_sequence_resync,
        "plan_preview": q_plan_preview,
        "schema_overview": q_schema_overview,
    }


def core_oracles() -> dict:
    return {
        "subset_summary": f"""
WITH {SUBSET_CTES}
SELECT 'customer' AS table_name, count(*) AS n_rows FROM cust
UNION ALL SELECT 'lineitem', count(*) FROM li
UNION ALL SELECT 'nation', count(*) FROM nat
UNION ALL SELECT 'orders', count(*) FROM seed_orders
UNION ALL SELECT 'part', count(*) FROM prt
UNION ALL SELECT 'region', count(*) FROM reg
UNION ALL SELECT 'supplier', count(*) FROM sup
""",
        "subset_integrity": f"""
WITH {SUBSET_CTES}
SELECT 'customer(c_nationkey)->nation' AS fk_edge,
       (SELECT count(*) FROM cust WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nat)) AS violations
UNION ALL SELECT 'lineitem(l_orderkey)->orders',
       (SELECT count(*) FROM li WHERE l_orderkey NOT IN (SELECT o_orderkey FROM seed_orders))
UNION ALL SELECT 'lineitem(l_partkey)->part',
       (SELECT count(*) FROM li WHERE l_partkey NOT IN (SELECT p_partkey FROM prt))
UNION ALL SELECT 'lineitem(l_suppkey)->supplier',
       (SELECT count(*) FROM li WHERE l_suppkey NOT IN (SELECT s_suppkey FROM sup))
UNION ALL SELECT 'nation(n_regionkey)->region',
       (SELECT count(*) FROM nat WHERE n_regionkey NOT IN (SELECT r_regionkey FROM reg))
UNION ALL SELECT 'orders(o_custkey)->customer',
       (SELECT count(*) FROM seed_orders WHERE o_custkey NOT IN (SELECT c_custkey FROM cust))
UNION ALL SELECT 'supplier(s_nationkey)->nation',
       (SELECT count(*) FROM sup WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nat))
""",
        "row_counts": _row_counts_sql(),
        "filter_eq": "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING' AND c_nationkey = 5",
        "point_lookup": "SELECT * FROM orders WHERE o_orderkey = 42",
        "anti_join_childless": "SELECT * FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
        "semi_join_parents": "SELECT * FROM nation WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)",
        "child_topk": f"""
SELECT * FROM (
  SELECT l.*, row_number() OVER (PARTITION BY l_orderkey ORDER BY {LI_COLS}) AS rn
  FROM lineitem l
) WHERE rn <= 3
""",
        "sample_fraction": "SELECT * FROM orders WHERE o_orderkey % 10 = 0",
        "sample_logarithmic": """
SELECT * FROM orders ORDER BY o_orderkey
LIMIT (SELECT CAST(round(pow(count(*), 0.5), 0) AS BIGINT) FROM orders)
""",
        "forced_rows_closure": """
WITH seed_orders AS (SELECT * FROM orders WHERE o_orderkey IN (1, 2, 3)),
cust AS (SELECT * FROM customer WHERE c_custkey IN (SELECT o_custkey FROM seed_orders)),
nat AS (SELECT * FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM cust)),
reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nat))
SELECT 'customer' AS table_name, count(*) AS n_rows FROM cust
UNION ALL SELECT 'nation', count(*) FROM nat
UNION ALL SELECT 'orders', count(*) FROM seed_orders
UNION ALL SELECT 'region', count(*) FROM reg
""",
        "sequence_resync": _seq_resync_sql(),
        "plan_preview": _plan_preview_sql(),
        # reflected schema vs DuckDB's information_schema over the same
        # parquet files: catalogs must agree on columns AND order
        "schema_overview": """
SELECT table_name, column_name,
       CAST(ordinal_position - 1 AS INT) AS position
FROM information_schema.columns
WHERE table_name IN ('customer','documents','embeddings','events',
                     'lineitem','nation','orders','part','region','supplier')
""",
    }
