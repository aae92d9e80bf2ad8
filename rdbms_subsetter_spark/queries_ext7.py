"""Extension battery 7: warehouse/curation operators — SCD2 interval
construction, temperature-scaled mixture sampling, and the salted
skew-join as a graded query.

All past the reference surface (18F/rdbms-subsetter moves rows, it
never derives them — SURVEY.md §2A); these are the remaining
training-pipeline staples: dimension versioning for metadata tables,
the standard multilingual-mixture reweighting (upsample low-resource
languages with p^t), and the skew-join pattern that keeps both working
when one key is hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdbms_subsetter_spark import partitioning
from rdbms_subsetter_spark.catalog import Catalog


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension) interval construction from an
    event log: collapse each user's consecutive runs of the same
    event_type into validity intervals [valid_from, valid_to) — the
    classic gaps-and-islands build.  Island ids come from a running sum
    of change flags; all three windows share ONE (user_id, ts) sort, the
    interval close (lead of the next island's start) reuses the same
    partitioning.  No joins, two shuffles total (window + final agg)."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w))
    ).cast("long")
    islands = ev.withColumn(
        "island", F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    iv = islands.groupBy("user_id", "island", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_iv = Window.partitionBy("user_id").orderBy("island")
    return iv.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        "n_events",
    )


_SQL_SCD2_INTERVALS = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR event_type <> lag(event_type) OVER w
              THEN 1 ELSE 0 END AS changed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT *, sum(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS island
  FROM flagged
), iv AS (
  SELECT user_id, island, event_type,
         min(ts) AS valid_from, count(*) AS n_events
  FROM islands GROUP BY 1, 2, 3
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) AS valid_to,
       n_events
FROM iv
"""


def q_mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture reweighting (t=0.7): per-language keep
    rate (c_min/c_l)^(1-t) — the standard multilingual upsampling curve,
    rate 1.0 for the smallest language, decaying for high-resource ones.
    Membership is the deterministic md5-bucket Bernoulli (same portable
    convention as mixture_weighted_sample), so the kept set is stable
    under retries, repartitions, and engine changes.  Two tiny aggregates
    + one broadcast join back to the scan: one pass over documents."""
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c_l"))
    cmin = counts.agg(F.min("c_l").alias("c_min"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "lang",
        "c_l",
        F.floor(
            F.pow(F.col("c_min") / F.col("c_l"), F.lit(0.3)) * 10000
        ).cast("long").alias("rate_bps"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 10000
    return (
        docs.join(F.broadcast(rates), "lang")
        .select("lang", "c_l", "rate_bps", (bucket < F.col("rate_bps")).cast("long").alias("keep"))
        .groupBy("lang")
        .agg(
            F.max("rate_bps").alias("rate_bps"),
            F.max("c_l").alias("n_total"),
            F.sum("keep").alias("n_kept"),
        )
    )


_SQL_MIXTURE_TEMPERATURE = """
WITH counts AS (
  SELECT lang, count(*) AS c_l FROM documents GROUP BY lang
), rates AS (
  SELECT lang, c_l,
         CAST(floor(pow(CAST((SELECT min(c_l) FROM counts) AS DOUBLE) / c_l,
                        0.3) * 10000) AS BIGINT) AS rate_bps
  FROM counts
)
SELECT lang, max(rate_bps) AS rate_bps, max(c_l) AS n_total,
       CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 10000 < rate_bps
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents JOIN rates USING (lang)
GROUP BY lang
"""


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join as a graded query: events ⋈ customer
    through the explicit (key, salt) widening in
    ``partitioning.salted_join`` — the pattern for a hot key whose
    reduce side outgrows one task when the dim side can't broadcast.
    Result must equal the plain join (the oracle), only the plan
    differs; the revenue roll-up proves no row was lost or doubled."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select("user_id", "value")
    cust = cat["customer"].select("c_custkey", "c_mktsegment")
    joined = partitioning.salted_join(ev, cust, "user_id", "c_custkey", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


_SQL_JOIN_SALTED_SKEW = """
SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def ext7_queries() -> dict:
    return {
        "scd2_intervals": q_scd2_intervals,
        "mixture_temperature_sample": q_mixture_temperature_sample,
        "join_salted_skew": q_join_salted_skew,
        "events_downsample_m4": q_events_downsample_m4,
        "cdc_apply_changelog": q_cdc_apply_changelog,
        "window_running_distinct": q_window_running_distinct,
    }


def ext7_oracles() -> dict:
    return {
        "scd2_intervals": _SQL_SCD2_INTERVALS,
        "mixture_temperature_sample": _SQL_MIXTURE_TEMPERATURE,
        "join_salted_skew": _SQL_JOIN_SALTED_SKEW,
        "events_downsample_m4": _SQL_EVENTS_DOWNSAMPLE_M4,
        "cdc_apply_changelog": _SQL_CDC_APPLY_CHANGELOG,
        "window_running_distinct": _SQL_WINDOW_RUNNING_DISTINCT,
    }


def q_events_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling: per (event_type, day) bucket emit
    first/last/min/max of the value — the standard error-free
    downsampler for visualization pipelines (each bucket's rendered
    line needs exactly those four points).  Unlike LTTB, M4 has no
    sequential dependency, so it parallelizes perfectly: both
    row_number directions share ONE sort per partition key, and the
    final aggregate folds into the same shuffle.  first/last are
    deterministic via the (ts, event_id) tiebreak."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day"), "ts",
        "event_id", "value",
    )
    w = Window.partitionBy("event_type", "day")
    asc = w.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    desc = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn_first", F.row_number().over(asc))
        .withColumn("rn_last", F.row_number().over(desc))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn_first") == 1, F.col("value"))).alias("v_first"),
            F.max(F.when(F.col("rn_last") == 1, F.col("value"))).alias("v_last"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


_SQL_EVENTS_DOWNSAMPLE_M4 = """
WITH ranked AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_first,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events
)
SELECT event_type, day, count(*) AS n_events,
       max(CASE WHEN rn_first = 1 THEN value END) AS v_first,
       max(CASE WHEN rn_last = 1 THEN value END) AS v_last,
       min(value) AS v_min,
       max(value) AS v_max
FROM ranked
GROUP BY 1, 2
"""


def q_cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog application (debezium-style): treat the event log
    as a change stream keyed by user_id — the latest operation wins,
    and a tombstone ('error' here) deletes the key from the snapshot.
    One max_by-shaped aggregate: the per-key argmax over (ts, event_id)
    is an algebraic aggregate (map-side partials, single shuffle), not
    a row_number window — the same decision as merge_upsert_latest,
    because a window would sort every partition of a 100 TB changelog
    while max_by only keeps one candidate per key per task."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select("user_id", "event_type", "ts", "event_id", "value")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    snap = ev.groupBy("user_id").agg(
        F.max_by("event_type", ordkey).alias("last_op"),
        F.max_by(F.round("value", 2), ordkey).alias("last_value"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    return snap.filter(F.col("last_op") != "error").select(
        "user_id", "last_op", "last_value", "last_ts", "n_changes"
    )


_SQL_CDC_APPLY_CHANGELOG = """
WITH ranked AS (
  SELECT user_id, event_type, ts, round(value, 2) AS value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes,
         max(ts) OVER (PARTITION BY user_id) AS last_ts
  FROM events
)
SELECT user_id, event_type AS last_op, value AS last_value,
       last_ts, n_changes
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a growing frame — Spark has no
    windowed count(DISTINCT), so the set itself is carried:
    size(collect_set() OVER (...rows unbounded preceding)).  Works when
    per-key cardinality is bounded (5 priorities here); for unbounded
    domains the scale path is the sketch twin (approx_count_distinct
    partials merged along the frame).  Restricted to one nation's
    customers to keep the graded output small."""
    cat = Catalog(spark, sf_dir)
    ords = (
        cat["orders"]
        .join(
            F.broadcast(
                cat["customer"].filter(F.col("c_nationkey") == 7)
            ).select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ords.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w)).alias("n_distinct_prio"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_so_far"),
    )


_SQL_WINDOW_RUNNING_DISTINCT = """
SELECT o_custkey, o_orderkey,
       CAST(count(DISTINCT o_orderpriority) OVER w AS INT) AS n_distinct_prio,
       count(*) OVER w AS n_orders_so_far
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 7)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""
