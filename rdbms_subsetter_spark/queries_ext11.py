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
    # explode both modes from the ONE window pass — a union of two
    # groupBys would make Spark duplicate the whole window subtree and
    # pay the per-user sort twice (verified in the physical plan)
    modes = F.explode(
        F.array(
            F.struct(
                F.lit("last_touch").alias("mode"),
                F.coalesce("last_touch", F.lit("none")).alias("touch_type"),
            ),
            F.struct(
                F.lit("first_touch").alias("mode"),
                F.coalesce("first_touch", F.lit("none")).alias("touch_type"),
            ),
        )
    )
    return (
        flagged.select("value", modes.alias("m"))
        .groupBy(F.col("m.mode").alias("mode"), F.col("m.touch_type").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
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
    # floor division, not truncation: events before the origin land in
    # negative weeks, and int-cast truncates toward zero while the
    # oracle's // floors — they disagree on day -1 (ADVICE r02)
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(_COHORT_ORIGIN).cast("date")) / 7
    ).cast("int")
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


# ---------------------------------------------------------------------------
# Robust outlier stats: median absolute deviation
# ---------------------------------------------------------------------------


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier report via median absolute deviation:
    median and MAD per event_type, plus how many events exceed the
    standard 3·1.4826·MAD robust z-threshold (1.4826 makes MAD a
    consistent σ estimator under normality).

    Scale shape: two group aggregations over the tiny event_type domain
    with the raw stream scanned twice and each per-group scalar
    broadcast back — the robust twin of ``events_anomaly_zscore``;
    no global sort (exact interpolated percentile aggregates
    per-group buffers, not an order-by)."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad"),
    )
    # the outlier count needs the finished MAD, so it is a third cheap
    # pass over the scan joined to the (5-row) stats frame
    stats = mad.select("event_type", F.round("med", 4).alias("median"), F.round("mad", 4).alias("mad"))
    full = ev.join(F.broadcast(mad.select("event_type", "med", "mad")), "event_type")
    counts = full.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.abs(F.col("value") - F.col("med")) > F.lit(3 * 1.4826) * F.col("mad")).cast("long")
        ).alias("n_outliers"),
    )
    return counts.join(F.broadcast(stats), "event_type").select(
        "event_type", "n", "median", "mad", "n_outliers"
    )


_SQL_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type, any_value(med) AS med,
         quantile_cont(abs(value - med), 0.5) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type)
SELECT e.event_type,
       count(*) AS n,
       round(any_value(med), 4) AS median,
       round(any_value(mad), 4) AS mad,
       CAST(sum(CASE WHEN abs(value - med) > 3 * 1.4826 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN mad USING (event_type)
GROUP BY e.event_type
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

import math as _math

_BENFORD = {d: round(_math.log10(1 + 1 / d), 6) for d in range(1, 10)}


def q_dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the standard
    forensic data-quality scan for fabricated or truncated numeric
    columns.  The leading digit is taken from the integer-cents string
    (canonical integer→string in every engine; float→string is not
    portable), expected frequencies are precomputed literals so both
    engines compare against identical constants."""
    cat = Catalog(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counted = (
        cat["orders"]
        .where(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()
    expected = F.create_map(
        *[x for d, p in _BENFORD.items() for x in (F.lit(d), F.lit(p))]
    )
    return counted.select(
        "digit",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("observed_freq"),
        expected[F.col("digit")].alias("benford_freq"),
        F.round(
            F.abs(F.col("n") / F.sum("n").over(w) - expected[F.col("digit")]), 6
        ).alias("abs_deviation"),
    )


# CAST: DuckDB types bare decimal literals as DECIMAL (stringifies
# '0.301030'); Spark's map literal is double ('0.30103')
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD.items()
)

_SQL_BENFORD = f"""
WITH counted AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice > 0
  GROUP BY 1)
SELECT digit, n,
       round(n * 1.0 / sum(n) OVER (), 6) AS observed_freq,
       CASE digit {_BENFORD_CASE} END AS benford_freq,
       round(abs(n * 1.0 / sum(n) OVER () - CASE digit {_BENFORD_CASE} END), 6) AS abs_deviation
FROM counted
"""


# ---------------------------------------------------------------------------
# Seasonality index
# ---------------------------------------------------------------------------


def q_orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index of order revenue: per-dow average
    order value relative to the overall average (index 1.0 = neutral).
    Integer-cents sums keep the cross-engine arithmetic exact; the
    final ratios divide identical integers.  One scan, 7-row domain,
    window-over-aggregate for the global denominator."""
    cat = Catalog(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    agg = (
        cat["orders"]
        .select(F.dayofweek("o_orderdate").alias("dow"), cents.alias("cents"))
        .groupBy("dow")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("sum_cents"))
    )
    w_all = Window.partitionBy()
    overall_avg = F.sum("sum_cents").over(w_all) / F.sum("n_orders").over(w_all)
    return agg.select(
        "dow",
        "n_orders",
        F.round(F.col("sum_cents") / F.col("n_orders") / 100.0, 4).alias("avg_value"),
        F.round((F.col("sum_cents") / F.col("n_orders")) / overall_avg, 6).alias(
            "seasonality_index"
        ),
    )


# DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday — shift to match
_SQL_ORDERS_SEASONALITY = """
WITH agg AS (
  SELECT dayofweek(o_orderdate) + 1 AS dow,
         count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
  FROM orders GROUP BY 1)
SELECT dow, n_orders,
       round(sum_cents * 1.0 / n_orders / 100.0, 4) AS avg_value,
       round((sum_cents * 1.0 / n_orders)
             / (sum(sum_cents) OVER () * 1.0 / sum(n_orders) OVER ()), 6) AS seasonality_index
FROM agg
"""


# ---------------------------------------------------------------------------
# Pareto concentration curve
# ---------------------------------------------------------------------------


def q_lineitem_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC concentration analysis: parts ranked by revenue, the
    cumulative revenue share at the top-1/5/10/25/50% rank cuts — the
    '80/20' report.  The expensive part is ONE aggregate over partkey;
    the ranking window runs over the already-reduced per-part frame,
    and the output is 5 rows.  Integer-cents revenue keeps cumulative
    sums exact across engines."""
    cat = Catalog(spark, sf_dir)
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    per_part = (
        cat["lineitem"]
        .select("l_partkey", cents.alias("cents"))
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("rev"))
    )
    w_rank = Window.orderBy(F.desc("rev"), "l_partkey")
    w_all = Window.partitionBy()
    ranked = per_part.select(
        "rev",
        F.row_number().over(w_rank).alias("rnk"),
        F.sum("rev").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_rev"
        ),
        F.sum("rev").over(w_all).alias("tot_rev"),
        F.count(F.lit(1)).over(w_all).alias("n_parts"),
    )
    # the rank cut for p% is ceil(n*p/100): each row tests itself
    # against all five cut ranks in one projection + explode — a
    # cuts-table join would be a non-equi BNLJ, and five re-filters
    # would recompute the whole window subtree five times
    cuts = F.filter(
        F.array(*[F.lit(p) for p in (1, 5, 10, 25, 50)]),
        lambda p: F.ceil(F.col("n_parts") * p / 100).cast("int") == F.col("rnk"),
    )
    return ranked.select(
        F.explode(cuts).alias("top_pct"),
        F.col("rnk").alias("n_top_parts"),
        F.round(F.col("cum_rev") / F.col("tot_rev"), 6).alias("revenue_share"),
    )


_SQL_PARETO = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT rev,
         row_number() OVER (ORDER BY rev DESC, l_partkey) AS rnk,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
         sum(rev) OVER () AS tot_rev,
         count(*) OVER () AS n_parts
  FROM per_part)
SELECT p.top_pct,
       CAST(rnk AS INT) AS n_top_parts,
       round(cum_rev * 1.0 / tot_rev, 6) AS revenue_share
FROM ranked
JOIN (VALUES (1), (5), (10), (25), (50)) AS p(top_pct)
  ON rnk = CAST(ceil(n_parts * p.top_pct / 100.0) AS INT)
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------


def q_events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event_type: the running sum of
    (value − type mean) peaks in magnitude at the most likely mean-shift
    point.  Reports that peak's timestamp, event id, and CUSUM value.

    Scale shape: the type means aggregate once (5-row frame) and
    broadcast back; the running sum is one window sort per event_type.
    The per-type window serializes a hot type into one sort range at
    100 TB — the standard answer is time-bucketed pre-aggregation
    before the CUSUM (same report at day granularity), which this query
    demonstrates by reducing to per-day sums first."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.sum("value").alias("day_sum"), F.count(F.lit(1)).alias("day_n"))
    )
    means = daily.groupBy("event_type").agg(
        (F.sum("day_sum") / F.sum("day_n")).alias("mu")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = (
        daily.join(F.broadcast(means), "event_type")
        .select(
            "event_type",
            "day",
            F.sum(F.col("day_sum") - F.col("mu") * F.col("day_n")).over(w).alias("cusum"),
        )
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), "day"
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select("event_type", "day", F.round("cusum", 4).alias("peak_cusum"))
    )


_SQL_CUSUM = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(value) AS day_sum, count(*) AS day_n
  FROM events GROUP BY 1, 2),
means AS (
  SELECT event_type, sum(day_sum) / sum(day_n) AS mu
  FROM daily GROUP BY event_type),
cusum AS (
  SELECT d.event_type, day,
         sum(day_sum - mu * day_n)
           OVER (PARTITION BY d.event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily d JOIN means USING (event_type))
SELECT event_type, day, round(cusum, 4) AS peak_cusum
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(cusum) DESC, day) AS rn
      FROM cusum)
WHERE rn = 1
"""


def ext11_queries() -> dict:
    return {
        "events_attribution": q_events_attribution,
        "events_cohort_matrix": q_events_cohort_matrix,
        "events_mad_outliers": q_events_mad_outliers,
        "dq_benford_digits": q_dq_benford_digits,
        "orders_seasonality": q_orders_seasonality,
        "lineitem_pareto_share": q_lineitem_pareto_share,
        "events_changepoint_cusum": q_events_changepoint_cusum,
    }


def ext11_oracles() -> dict:
    return {
        "events_attribution": _SQL_ATTRIBUTION,
        "events_cohort_matrix": _SQL_COHORT_MATRIX,
        "events_mad_outliers": _SQL_MAD_OUTLIERS,
        "dq_benford_digits": _SQL_BENFORD,
        "orders_seasonality": _SQL_ORDERS_SEASONALITY,
        "lineitem_pareto_share": _SQL_PARETO,
        "events_changepoint_cusum": _SQL_CUSUM,
    }
