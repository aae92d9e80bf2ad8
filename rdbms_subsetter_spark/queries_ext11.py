"""Graded queries, part 11 (round 2): event-stream marketing analytics —
multi-touch attribution and cohort retention matrices.

Same contract as queries_core: identical aliases both sides, floats
rounded both sides, no array/map outputs (driver canonicalizer).

Reference parity note: the upstream reference (18F/rdbms-subsetter) has
no analytics surface; these extend SURVEY §2B's events/time-series
family with the two reports every product-analytics warehouse runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog

# ---------------------------------------------------------------------------
# First/last-touch attribution
# ---------------------------------------------------------------------------

_TOUCH_TYPES = ("click", "view", "signup")


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch revenue attribution: every purchase's
    value is credited to the user's first (resp. most recent preceding)
    touch event (click/view/signup); purchases with no preceding touch
    credit 'none'.

    Scale shape: ONE shuffle — both attribution modes ride the same
    per-user window sort (last-touch = last(ignoreNulls) over an
    unbounded-preceding frame, first-touch = first(ignoreNulls) over the
    same frame) — then an aggregate over a tiny (mode × touch-type)
    domain.  No self-join of purchases against touches."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    touch = F.when(F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
    ).where(F.col("event_type") == "purchase")

    def attribute(mode: str, col: str) -> DataFrame:
        return (
            flagged.groupBy(F.coalesce(F.col(col), F.lit("none")).alias("touch_type"))
            .agg(
                F.count(F.lit(1)).alias("n_purchases"),
                F.round(F.sum("value"), 2).alias("attributed_value"),
            )
            .select(F.lit(mode).alias("mode"), "touch_type", "n_purchases", "attributed_value")
        )

    return attribute("last_touch", "last_touch").unionByName(
        attribute("first_touch", "first_touch")
    )


_SQL_ATTRIBUTION = f"""
WITH flagged AS (
  SELECT user_id, event_type, value,
         last_value(CASE WHEN event_type IN {str(_TOUCH_TYPES)} THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch,
         first_value(CASE WHEN event_type IN {str(_TOUCH_TYPES)} THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch
  FROM events),
purch AS (SELECT * FROM flagged WHERE event_type = 'purchase')
SELECT 'last_touch' AS mode, coalesce(last_touch, 'none') AS touch_type,
       count(*) AS n_purchases, round(sum(value), 2) AS attributed_value
FROM purch GROUP BY 2
UNION ALL
SELECT 'first_touch' AS mode, coalesce(first_touch, 'none') AS touch_type,
       count(*) AS n_purchases, round(sum(value), 2) AS attributed_value
FROM purch GROUP BY 2
"""


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------

_COHORT_ORIGIN = "2024-01-01"


def q_events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the week of
    their first event (weeks = whole 7-day blocks since a fixed origin,
    not ISO weeks — identical arithmetic in any engine), and each
    (cohort_week, week_offset) cell counts distinct users active that
    many weeks later.

    Scale shape: one groupBy(user) for first-seen, one join back on
    user_id (AQE picks broadcast when the user dimension fits), one
    count-distinct over the tiny cohort×offset domain."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    week = (F.datediff(F.col("ts").cast("date"), F.lit(_COHORT_ORIGIN).cast("date")) / 7).cast(
        "int"
    )
    first_seen = (
        ev.select("user_id", week.alias("week"))
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    return (
        ev.select("user_id", week.alias("week"))
        .join(first_seen, "user_id")
        .groupBy(
            F.col("cohort_week"),
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


_SQL_COHORT_MATRIX = f"""
WITH weekly AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '{_COHORT_ORIGIN}', CAST(ts AS DATE)) // 7 AS INT) AS week
  FROM events),
first_seen AS (
  SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id)
SELECT cohort_week,
       week - cohort_week AS week_offset,
       count(DISTINCT user_id) AS n_active_users
FROM weekly JOIN first_seen USING (user_id)
GROUP BY 1, 2
"""


def ext11_queries() -> dict:
    return {
        "events_attribution": q_events_attribution,
        "events_cohort_matrix": q_events_cohort_matrix,
    }


def ext11_oracles() -> dict:
    return {
        "events_attribution": _SQL_ATTRIBUTION,
        "events_cohort_matrix": _SQL_COHORT_MATRIX,
    }
