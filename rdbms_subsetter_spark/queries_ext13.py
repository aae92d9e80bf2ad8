"""Graded queries, part 13 (round 2 closing batch): per-document TF-IDF
keyword extraction, nearest (bidirectional) as-of matching, and an
equi-depth histogram.

Same contract as queries_core: identical aliases both sides, floats
rounded both sides, no array/map outputs (driver canonicalizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import text
from rdbms_subsetter_spark.queries_ext import _RAW_TOKS

# ---------------------------------------------------------------------------
# Per-document TF-IDF keywords
# ---------------------------------------------------------------------------

_KW_K = 3


def q_doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document — the metadata-enrichment step
    of a corpus pipeline (per-doc topical tags from corpus statistics
    alone).  tf = in-doc count, idf = ln(N/df) with df from the SAME
    (doc, token) pre-aggregation that feeds tf (one explode, reused);
    N is a bounded driver scalar.  The top-3 window gets
    WindowGroupLimit partial pruning, so at most 3 candidates per doc
    survive to the final shuffle.  Cross-engine ordering ties are
    decided on the ROUNDED score + token, immune to ln() ulp drift."""
    cat = Catalog(spark, sf_dir)
    n_docs = float(cat["documents"].count())
    tf = (
        cat["documents"]
        .select("doc_id", F.explode(text.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)  # feeds both df and the scored join
    )
    df_counts = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_counts, "tok").select(
        "doc_id",
        "tok",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 9).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _KW_K)
        .select("doc_id", "rnk", F.col("tok").alias("keyword"), F.round("tfidf", 4).alias("tfidf"))
    )


_SQL_DOC_KEYWORDS = f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest({_RAW_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT doc_id, tok,
         round(tf * ln((SELECT count(*) FROM documents) * 1.0 / df), 9) AS tfidf
  FROM tf JOIN df USING (tok))
SELECT doc_id, CAST(rnk AS INT) AS rnk, tok AS keyword, round(tfidf, 4) AS tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS rnk
      FROM scored)
WHERE rnk <= {_KW_K}
"""


# ---------------------------------------------------------------------------
# Nearest as-of match (bidirectional)
# ---------------------------------------------------------------------------


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of: each purchase is matched to the user's
    CLOSEST error event in time, whichever side it lies on — the
    bidirectional variant of the strict-backward as-of join (which only
    looks back).  Both direction probes ride ONE union + one window
    sort per user (the same sort-interleave strategy as asof_join_*,
    run once forward and once with reversed frames); no purchase×error
    pair join ever materializes."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.col("ts")).alias("err_ts"),
        (F.col("event_type") == "purchase").alias("is_p"),
    ).where(F.col("event_type").isin("purchase", "error"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_err = F.last("err_ts", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    next_err = F.first("err_ts", ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    both = marked.select(
        "user_id", "ts", "event_id", "is_p",
        prev_err.alias("prev_ts"), next_err.alias("next_ts"),
    ).where(F.col("is_p"))
    # exact integer microseconds on both engines (DuckDB epoch() is a
    # fractional double; per-second casts truncate differently)
    def us(c: F.Column) -> F.Column:
        return F.unix_micros(c.cast("timestamp"))

    d_prev = us(F.col("ts")) - us(F.col("prev_ts"))
    d_next = us(F.col("next_ts")) - us(F.col("ts"))
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(d_prev <= d_next, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    return both.select(
        "event_id",
        "user_id",
        nearest.alias("nearest_error_ts"),
        F.when(
            nearest.isNotNull(), F.abs(us(F.col("ts")) - us(nearest))
        ).alias("gap_us"),
    )


_SQL_ASOF_NEAREST = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN ts END AS err_ts,
         event_type = 'purchase' AS is_p
  FROM events WHERE event_type IN ('purchase', 'error')),
spanned AS (
  SELECT user_id, ts, event_id, is_p,
         last_value(err_ts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
         first_value(err_ts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM marked),
picked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN prev_ts IS NULL THEN next_ts
              WHEN next_ts IS NULL THEN prev_ts
              WHEN epoch_us(ts) - epoch_us(prev_ts)
                   <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
              ELSE next_ts END AS nearest_error_ts
  FROM spanned WHERE is_p)
SELECT event_id, user_id, nearest_error_ts,
       CASE WHEN nearest_error_ts IS NOT NULL
            THEN abs(epoch_us(ts) - epoch_us(nearest_error_ts)) END AS gap_us
FROM picked
"""


# ---------------------------------------------------------------------------
# Equi-depth histogram
# ---------------------------------------------------------------------------

_EQD_BUCKETS = 10


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals — the statistic
    behind data-skipping zone maps and range-partition planning
    (equi-WIDTH buckets collapse under skew; equi-depth bounds every
    bucket at ~n/k rows by construction).  Boundaries come from ONE
    exact-percentile aggregate (bounded driver scalars, the IVF/PCA
    fit convention), bucketing is a literal CASE in codegen on a second
    scan."""
    cat = Catalog(spark, sf_dir)
    orders = cat["orders"]
    qs = [i / _EQD_BUCKETS for i in range(1, _EQD_BUCKETS)]
    # ONE percentile buffer for all nine boundaries (the array form);
    # nine scalar percentile() aggregates each maintain their own
    # sorted buffer over the full column (measured 3.0 -> 1.3 s)
    bounds = orders.agg(
        F.percentile(
            F.col("o_totalprice"), F.array(*[F.lit(q) for q in qs])
        ).alias("bs")
    ).collect()[0]["bs"]
    # empty input: percentile of zero rows is NULL -> no boundaries,
    # every (non-existent) row would fall in bucket 0, output is empty
    if bounds is None:
        bounds = []
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col("o_totalprice") > F.lit(b)).cast("int")
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


_SQL_EQUIDEPTH = f"""
WITH bounds AS (
  SELECT quantile_cont(o_totalprice,
           [{", ".join(str(i / _EQD_BUCKETS) for i in range(1, _EQD_BUCKETS))}]) AS bs
  FROM orders),
bucketed AS (
  SELECT o_totalprice,
         CAST(len(list_filter((SELECT bs FROM bounds), b -> o_totalprice > b)) AS INT) AS bucket
  FROM orders)
SELECT bucket, count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM bucketed
GROUP BY bucket
"""


def ext13_queries() -> dict:
    return {
        "doc_keywords_tfidf": q_doc_keywords_tfidf,
        "asof_join_nearest": q_asof_join_nearest,
        "equidepth_histogram": q_equidepth_histogram,
    }


def ext13_oracles() -> dict:
    return {
        "doc_keywords_tfidf": _SQL_DOC_KEYWORDS,
        "asof_join_nearest": _SQL_ASOF_NEAREST,
        "equidepth_histogram": _SQL_EQUIDEPTH,
    }
