"""Sinks: topologically ordered writes + plan preview.

Reference ops covered:
  #16 row insert        — ``subsetter.py::Db.create_row_in`` insert →
      table-at-a-time ``df.write.parquet`` (or ``.jdbc``) in
      parents-first topological order, so a constrained destination
      accepts every table as it lands.
  #17 sequence resync   — ``subsetter.py::update_sequences``
      (postgres ``setval(seq, max(col))``) → ``F.max(pk)`` report;
      the DDL side only applies to JDBC targets.
  #18 plan preview      — ``Db.confirm``: per-table
      ``source_rows → target_rows`` report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.constraints import ConstraintRegistry
from rdbms_subsetter_spark.sampling import SamplePlan


@dataclass
class PlanLine:
    table: str
    source_rows: int
    target_rows: int
    policy: str


def plan_preview(catalog: Catalog, plan: SamplePlan) -> list[PlanLine]:
    """Per-table ``source → target`` sizing report (reference
    ``Db.confirm`` prints this and prompts unless ``-y``)."""
    out = []
    for table in catalog.tables():
        pol = plan.policy_for(table)
        n = catalog.count_estimate(table)
        out.append(PlanLine(table, n, pol.target(n), pol.mode))
    return out


def write_subset(
    rows: dict[str, DataFrame],
    registry: ConstraintRegistry,
    out_dir: str,
    mode: str = "overwrite",
) -> list[str]:
    """Write every table in parents-first topo order; returns the order.

    Parquet has no FK checks, but the order contract is what lets the
    same code target a constrained JDBC destination (swap the write
    call), mirroring the reference's parents-before-children insert
    discipline.
    """
    order = [t for t in registry.topo_order() if t in rows]
    order += [t for t in rows if t not in order]
    for table in order:
        rows[table].write.mode(mode).parquet(f"{out_dir}/{table}.parquet")
    return order


def write_subset_jdbc(
    rows: dict[str, DataFrame],
    registry: ConstraintRegistry,
    url: str,
    driver: str,
    mode: str = "overwrite",
) -> list[str]:
    """Write every table into a JDBC destination in parents-first topo
    order; returns the order.

    This is the reference's actual destination shape
    (`subsetter.py::Db.create_row_in` inserts into a live RDBMS), done
    set-at-a-time.  The FK-safety claim is mode-specific: with
    ``mode='append'`` into a pre-created schema with enforced FK
    constraints, parents-first order means every batch is accepted.
    The default ``mode='overwrite'`` DROPs and recreates each table
    (and Spark's JDBC writer emits no constraint DDL), so it assumes a
    constraint-free destination — dropping a parent that an existing
    child FK references would be rejected by the database regardless
    of order.  The sink itself is the batched ``write_jdbc`` (one
    round-trip per batch, not per row).
    """
    from rdbms_subsetter_spark.sources.io import write_jdbc

    order = [t for t in registry.topo_order() if t in rows]
    order += [t for t in rows if t not in order]
    for table in order:
        write_jdbc(rows[table], url, table, driver=driver, mode=mode)
    return order


def sequence_resync_report(rows: dict[str, DataFrame], registry: ConstraintRegistry) -> dict[str, int]:
    """``max(pk)`` per single-column-PK table — the value a postgres
    ``setval`` would need after load (reference ``update_sequences``)."""
    out: dict[str, int] = {}
    for table, df in rows.items():
        pk = registry.pk(table)
        if len(pk) == 1:
            row = df.agg(F.max(pk[0]).alias("m")).collect()[0]
            if row["m"] is not None:
                out[table] = row["m"]
    return out
