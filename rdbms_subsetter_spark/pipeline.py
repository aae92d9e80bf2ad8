"""Flagship end-to-end subset pipeline, deterministic + oracle-expressible.

This is the Spark re-expression of one full reference run
(``rdbms-subsetter SRC DEST 0.05`` with a deterministic seed):

  seed orders (pk % 20 == 0)
    → parent closure  orders→customer→nation→region            (op #9)
    → capped child pull  lineitem: top-3 per order by PK        (op #10)
    → re-close parents  lineitem→{part, supplier}→nation→region (op #9)
    → per-table summary (the reference's plan/confirm report)    (op #18)

Everything is deterministic (modulo seed predicate + PK-ordered child
cap), so the exact same subset is expressible in ANSI SQL for the
DuckDB oracle — see ``__spark_entry__.oracle_sql()['subset_summary']``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.closure import ClosureEngine
from rdbms_subsetter_spark.sampling import sample_modulo


def subset_rows(spark: SparkSession, sf_dir: str, modulus: int = 20, children: int = 3) -> dict[str, DataFrame]:
    """Run the flagship subset; return selected rows per table."""
    cat = Catalog(spark, sf_dir)
    eng = ClosureEngine(cat)
    reg = cat.registry

    seed_orders = sample_modulo(cat["orders"], "o_orderkey", modulus)
    keys = {"orders": seed_orders.select("o_orderkey")}
    keys = eng.close_parents(keys)

    li_edge = [fk for fk in reg.fks if fk.table == "lineitem" and fk.ref_table == "orders"]
    keys = eng.pull_children(keys, k=children, edges=li_edge)
    keys = eng.close_parents(keys)

    # Whether the key sets are materialized is the ENGINE's
    # scale-adaptive call (closure.CLOSURE_MATERIALIZE_BYTES): at
    # bench/test SFs they deliberately are NOT — the shallow semi-join
    # trees re-execute in parallel inside one job, measured 2× faster
    # than any cache/checkpoint variant (r11 and r12 both measured it;
    # InMemoryRelation blocks pruning and serializes the branch that
    # populates it, and each checkpoint is a serializing driver
    # action).  Above the threshold each key set materializes once,
    # so the integrity/summary branches stop replaying the closure
    # subtree per FK edge (~139 runtime scans at sf0.1 → O(#tables +
    # #edges)).
    return {t: eng.rows_for_keys(t, k) for t, k in keys.items()}


def subset_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table row counts of the flagship subset, as one lazy plan
    (a union of count aggregates — no driver-side collect loop)."""
    rows = subset_rows(spark, sf_dir)
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("table_name"), F.col("n_rows")
        )
        for t, df in sorted(rows.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("table_name")


def subset_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-violation counts over the flagship subset — all zeros is the
    reference's core invariant (SURVEY.md §5a).  One lazy plan."""
    cat = Catalog(spark, sf_dir)
    eng = ClosureEngine(cat)
    rows = subset_rows(spark, sf_dir)
    return eng.integrity_violations_df(rows).orderBy("fk_edge")
