"""Real RDBMS (JDBC) round-trip over embedded Derby.

The reference's entire job is RDBMS→RDBMS (`subsetter.py::Db.__init__`
reflects both ends over DB-API URLs; `create_row_in` inserts into the
destination).  Derby ships on Spark's classpath, so the JDBC source and
sink run for real here — no external server, no env gate: parquet
tables are written into a Derby database in topological FK order (a
constrained destination would accept them) and scanned back, proving
values survive the SQL type system and that the partitioned JDBC scan
splits correctly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.constraints import tpch_registry
from rdbms_subsetter_spark.sources.io import (
    DERBY_EMBEDDED_DRIVER,
    derby_url,
    jdbc_roundtrip,
    read_jdbc,
    write_jdbc,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def derby_tables(spark):
    """region→nation→customer written to one Derby DB in topo order."""
    cat = Catalog(spark, SF_SMALL)
    url = derby_url(f"{SF_SMALL}/integrity")
    tables = ["region", "nation", "customer"]  # parent-first FK order
    for t in tables:
        write_jdbc(cat[t], url, t, driver=DERBY_EMBEDDED_DRIVER, mode="overwrite")
    return cat, url, tables


def test_roundtrip_counts_match(spark, derby_tables):
    cat, url, tables = derby_tables
    for t in tables:
        back = read_jdbc(spark, url, t, driver=DERBY_EMBEDDED_DRIVER)
        assert back.count() == cat[t].count(), t


def test_partitioned_scan_values_exact(spark, derby_tables):
    """Range-partitioned scan (8 splits on the numeric PK) returns the
    identical row set — no boundary row lost or doubled."""
    cat, url, _ = derby_tables
    back = read_jdbc(
        spark, url, "customer",
        driver=DERBY_EMBEDDED_DRIVER,
        partition_column="c_custkey",
        num_partitions=8,
    )
    orig = cat["customer"]
    assert back.count() == orig.count()
    # exact value equality both directions (symmetric difference empty)
    cols = orig.columns
    assert back.select(cols).exceptAll(orig.select(cols)).count() == 0
    assert orig.select(cols).exceptAll(back.select(cols)).count() == 0


def test_fk_integrity_survives_sink(spark, derby_tables):
    """Anti-join of child FK values vs parents is empty after the JDBC
    round-trip — the destination-side invariant the reference's
    topo-ordered inserts exist to guarantee."""
    _, url, _ = derby_tables
    nation = read_jdbc(spark, url, "nation", driver=DERBY_EMBEDDED_DRIVER)
    region = read_jdbc(spark, url, "region", driver=DERBY_EMBEDDED_DRIVER)
    customer = read_jdbc(spark, url, "customer", driver=DERBY_EMBEDDED_DRIVER)
    orphans_n = (
        nation.where(F.col("n_regionkey").isNotNull())
        .join(region, nation["n_regionkey"] == region["r_regionkey"], "left_anti")
        .count()
    )
    orphans_c = (
        customer.where(F.col("c_nationkey").isNotNull())
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"], "left_anti")
        .count()
    )
    assert orphans_n == 0 and orphans_c == 0


def test_sequence_resync_value(spark, derby_tables):
    """op #17: after load, max(pk) from the DESTINATION is the value a
    sequence resync would setval() — must equal the source max."""
    cat, url, _ = derby_tables
    back_max = (
        read_jdbc(spark, url, "customer", driver=DERBY_EMBEDDED_DRIVER)
        .agg(F.max("c_custkey"))
        .collect()[0][0]
    )
    src_max = cat["customer"].agg(F.max("c_custkey")).collect()[0][0]
    assert back_max == src_max


def test_jdbc_roundtrip_helper(spark):
    """One-call helper: write + partitioned read-back, value-exact."""
    cat = Catalog(spark, SF_SMALL)
    sup = cat["supplier"]
    back = jdbc_roundtrip(
        sup, f"{SF_SMALL}/helper", "supplier", partition_column="s_suppkey"
    )
    assert back.count() == sup.count()
    assert back.select(sup.columns).exceptAll(sup).count() == 0


def test_registry_topo_order_is_parent_first():
    """The FK registry's topological order writes parents before
    children for every FK edge (what the Derby sink relies on)."""
    reg = tpch_registry()
    order = {t: i for i, t in enumerate(reg.topo_order())}
    for fk in reg.fks:
        if fk.ref_table != fk.table:
            assert order[fk.ref_table] <= order[fk.table], fk
