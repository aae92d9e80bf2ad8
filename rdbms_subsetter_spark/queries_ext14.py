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


def ext14_queries() -> dict:
    return {
        "jdbc_source_agg": q_jdbc_source_agg,
    }


def ext14_oracles() -> dict:
    return {
        "jdbc_source_agg": _SQL_JDBC_SOURCE,
    }
