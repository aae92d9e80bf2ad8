"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship FK-closure subset pipeline on
sf0.001; ``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (core reference surface + §2B extensions); ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for every SQL-expressible entry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from rdbms_subsetter_spark import pipeline  # noqa: E402
from rdbms_subsetter_spark.queries_core import core_oracles, core_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext import ext_oracles, ext_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext2 import ext2_oracles, ext2_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext3 import ext3_oracles, ext3_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext4 import ext4_oracles, ext4_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext5 import ext5_oracles, ext5_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext6 import ext6_oracles, ext6_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext7 import ext7_oracles, ext7_queries  # noqa: E402
from rdbms_subsetter_spark.queries_ext8 import ext8_oracles, ext8_queries  # noqa: E402
from rdbms_subsetter_spark.queries_tpch import tpch_oracles, tpch_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return pipeline.subset_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(core_queries())
    out.update(ext_queries())
    out.update(ext2_queries())
    out.update(ext3_queries())
    out.update(ext4_queries())
    out.update(ext5_queries())
    out.update(ext6_queries())
    out.update(ext7_queries())
    out.update(ext8_queries())
    out.update(tpch_queries())
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, sql in {
        **core_oracles(),
        **ext_oracles(),
        **ext2_oracles(),
        **ext3_oracles(),
        **ext4_oracles(),
        **ext5_oracles(),
        **ext6_oracles(),
        **ext7_oracles(),
        **ext8_oracles(),
        **tpch_oracles(),
    }.items():
        if sql is not None:
            out[name] = sql
    return out
