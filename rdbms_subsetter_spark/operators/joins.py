"""Temporal / non-equi join operators the reference lacks (SURVEY.md §2A
"Not implemented by the reference": no theta/range/as-of joins).

* **as-of join** — each left row matched to the most recent right row
  at-or-before its timestamp, per key.  Implemented as the *sort-based
  union* pattern, not a join: tag both sides, union, and carry the last
  right payload forward with ``last(..., ignorenulls=True)`` over a
  (key, ts)-sorted window.  One shuffle, no left×right fan-out — the
  100 TB-safe plan (an equi-join + ``ts <= ts2`` filter would build
  every (event, earlier-order) pair before pruning; this never does).
* **band (range) join** — rows bucketed into value bands via a small
  broadcast dimension and a non-equi predicate (BroadcastNestedLoopJoin:
  the band table is tiny, the fact side streams through it with no
  shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: for every left row, attach *payload* columns
    of the right row with the greatest ``right_ts <= left_ts`` (or
    ``< left_ts`` when ``strict``) sharing the join key.  Left rows with
    no prior right row keep NULL payload (left-outer semantics).

    ``on`` is a list of (left_col, right_col) key pairs; ``tiebreak``
    makes the winner deterministic when several right rows share the
    max timestamp (highest tiebreak value wins).

    Mechanics: right rows are packed into a struct and unioned with the
    left side under a common (key, ts, side) sort; a single
    ``last(struct) IGNORE NULLS`` window pass assigns each left row the
    latest right payload.  Right rows sort *before* left rows at equal
    ts (inclusive) or *after* them (strict).
    """
    lkeys = [lc for lc, _ in on]
    payload_struct = F.struct(*[F.col(c) for c in payload])
    r = right.select(
        *[F.col(rc).alias(lc) for lc, rc in on],
        F.col(right_ts).alias("__ts"),
        F.lit(2 if strict else 0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tie"),
        payload_struct.alias("__r"),
        F.lit(None).cast(left.select(F.struct(*left.columns)).schema[0].dataType).alias("__l"),
    )
    l = left.select(  # noqa: E741
        *[F.col(c) for c in lkeys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*left.columns).alias("__l"),
    )
    w = (
        Window.partitionBy(*lkeys)
        .orderBy(F.asc("__ts"), F.asc("__side"), F.asc_nulls_first("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__l.*"), *[F.col(f"__match.{c}").alias(c) for c in payload]
    )
    return out


def band_join(
    fact: DataFrame,
    value_col: str,
    bands: list[tuple[float, float]],
    band_col: str = "band_lo",
) -> DataFrame:
    """Attach a band label to every fact row with ``lo <= value < hi``.

    The band table is a literal in the plan and explicitly broadcast;
    the fact side never shuffles (BroadcastNestedLoopJoin on the
    non-equi predicate).  Rows outside every band are dropped (inner).
    """
    spark = fact.sparkSession
    bdf = spark.createDataFrame(
        [(float(lo), float(hi)) for lo, hi in bands], "__lo double, __hi double"
    )
    cond = (F.col(value_col) >= F.col("__lo")) & (F.col(value_col) < F.col("__hi"))
    return (
        fact.join(F.broadcast(bdf), on=cond, how="inner")
        .withColumn(band_col, F.col("__lo"))
        .drop("__lo", "__hi")
    )
