"""Graded queries, part 10 (round 2): corpus-quality rule batteries,
reproducible dataset splits, heavy-hitter/skew diagnostics, substring-
level duplication coverage, and remaining SQL-surface items
(GROUP BY ALL, UNPIVOT).

Same contract as queries_core: identical aliases both sides, floats
rounded both sides, no array/map outputs (driver canonicalizer).

Reference parity note: the upstream reference (18F/rdbms-subsetter,
``subsetter.py``) has no analytics surface; these entries extend SURVEY
§2B's training-data-pipeline families.  Every operator here is a pure
DataFrame expression (no UDFs) — single-scan shapes that stay in
whole-stage codegen and survive a 100 TB scale-up.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark import partitioning
from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import text
from rdbms_subsetter_spark.queries_ext import _EN_STOP, _RAW_TOKS

# ---------------------------------------------------------------------------
# Gopher-style quality rule battery
# ---------------------------------------------------------------------------


def q_docpipe_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-battery document filter in the Gopher/C4 style: token-count
    band, mean-word-length band, alphabetic-token fraction, stopword
    floor — each rule reported per document plus the conjunction.  One
    scan, all column expressions; at 100 TB this is an embarrassingly
    parallel map with zero shuffles (the output is written, not
    aggregated)."""
    cat = Catalog(spark, sf_dir)
    t = F.col("text")
    toks = text.tokens(t)
    n_tok = F.size(toks)
    mean_len = F.length(F.regexp_replace(t, r"\s+", "")) / n_tok
    alpha_frac = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / n_tok
    arr = F.array(*[F.lit(w) for w in text.STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    ok_len = n_tok.between(50, 100000)
    ok_word = (mean_len >= 3.0) & (mean_len <= 10.0)
    ok_alpha = alpha_frac >= 0.8
    ok_stop = n_stop >= 2
    return cat["documents"].select(
        "doc_id",
        n_tok.cast("int").alias("n_tok"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("int").alias("n_stop"),
        ok_len.cast("int").alias("ok_len"),
        ok_word.cast("int").alias("ok_word_len"),
        ok_alpha.cast("int").alias("ok_alpha"),
        ok_stop.cast("int").alias("ok_stop"),
        (ok_len & ok_word & ok_alpha & ok_stop).cast("int").alias("pass_all"),
    )


_SQL_GOPHER_RULES = f"""
WITH d AS (
  SELECT doc_id,
         len({_RAW_TOKS}) AS n_tok,
         length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / len({_RAW_TOKS}) AS mean_len,
         len(list_filter({_RAW_TOKS}, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0
             / len({_RAW_TOKS}) AS alpha_frac,
         len(list_filter({_RAW_TOKS}, x -> list_contains({_EN_STOP}, x))) AS n_stop
  FROM documents)
SELECT doc_id,
       CAST(n_tok AS INT) AS n_tok,
       round(mean_len, 6) AS mean_word_len,
       round(alpha_frac, 6) AS alpha_frac,
       CAST(n_stop AS INT) AS n_stop,
       CAST(n_tok BETWEEN 50 AND 100000 AS INT) AS ok_len,
       CAST(mean_len BETWEEN 3.0 AND 10.0 AS INT) AS ok_word_len,
       CAST(alpha_frac >= 0.8 AS INT) AS ok_alpha,
       CAST(n_stop >= 2 AS INT) AS ok_stop,
       CAST((n_tok BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
            AND alpha_frac >= 0.8 AND n_stop >= 2 AS INT) AS pass_all
FROM d
"""


# ---------------------------------------------------------------------------
# Reproducible train/valid/test split (row-hash and group-aware modes)
# ---------------------------------------------------------------------------

_SPLIT_SEED = 7


# shared with the curate pipeline CLI (partitioning.split_assignment)
_portable_pct = partitioning.portable_pct


def _pct_sql(expr: str, seed: int) -> str:
    return f"CAST(('0x' || substr(md5('{seed}|' || {expr}), 1, 15)) AS BIGINT) % 100"


def q_split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 corpus split, two assignment modes reported
    side by side: ``row`` (hash of doc_id — iid) and ``group`` (hash of
    source — leakage-safe: every doc from one domain lands in the same
    split, the standard guard against train/test contamination via
    near-duplicate pages from one site).  Output is the per-mode
    per-split audit: doc count and distinct-source count.

    Scale shape: one scan, two cheap aggregates over 3-row groups —
    the split column itself would be written alongside the data."""
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"]

    def splits(pct: F.Column) -> F.Column:
        return (
            F.when(pct < 90, F.lit("train"))
            .when(pct < 95, F.lit("valid"))
            .otherwise(F.lit("test"))
        )

    by_row = (
        docs.select(
            splits(_portable_pct(F.col("doc_id"), _SPLIT_SEED)).alias("split"), "source"
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .select(F.lit("row").alias("mode"), "split", "n_docs", "n_sources")
    )
    by_group = (
        docs.select(
            splits(_portable_pct(F.col("source"), _SPLIT_SEED)).alias("split"), "source"
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .select(F.lit("group").alias("mode"), "split", "n_docs", "n_sources")
    )
    return by_row.unionByName(by_group)


_SQL_SPLIT = f"""
WITH row_mode AS (
  SELECT CASE WHEN {_pct_sql('doc_id', _SPLIT_SEED)} < 90 THEN 'train'
              WHEN {_pct_sql('doc_id', _SPLIT_SEED)} < 95 THEN 'valid'
              ELSE 'test' END AS split, source
  FROM documents),
grp_mode AS (
  SELECT CASE WHEN {_pct_sql('source', _SPLIT_SEED)} < 90 THEN 'train'
              WHEN {_pct_sql('source', _SPLIT_SEED)} < 95 THEN 'valid'
              ELSE 'test' END AS split, source
  FROM documents)
SELECT 'row' AS mode, split, count(*) AS n_docs, count(DISTINCT source) AS n_sources
FROM row_mode GROUP BY split
UNION ALL
SELECT 'group' AS mode, split, count(*) AS n_docs, count(DISTINCT source) AS n_sources
FROM grp_mode GROUP BY split
"""


# ---------------------------------------------------------------------------
# Heavy hitters: exact global top-k tokens
# ---------------------------------------------------------------------------


def q_heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 most frequent tokens corpus-wide.  explode →
    groupBy(token) → TakeOrderedAndProject: the groupBy gets map-side
    partial aggregation for free (token domain ≪ token occurrences), and
    the final top-k is a per-partition heap + driver merge of 20-row
    heaps, never a global sort.  This is the exact twin of the
    count-min-sketch heavy-hitters in ``agg_approx_sketches``."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["documents"]
        .select(F.explode(text.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(20)
    )


_SQL_HEAVY_HITTERS = f"""
SELECT token, count(*) AS n_occurrences
FROM (SELECT unnest({_RAW_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Token-length histogram
# ---------------------------------------------------------------------------


def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (32-token) histogram of document lengths with mean
    chars per bucket — the length-distribution report every corpus audit
    starts with.  One scan + one tiny-domain aggregate."""
    cat = Catalog(spark, sf_dir)
    n_tok = text.token_count(F.col("text"))
    return (
        cat["documents"]
        .select(
            (F.floor(n_tok / 32) * 32).cast("int").alias("bucket_lo"),
            F.col("n_chars"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


_SQL_TOKEN_HISTOGRAM = f"""
SELECT CAST((len({_RAW_TOKS}) // 32) * 32 AS INT) AS bucket_lo,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Skew diagnosis report
# ---------------------------------------------------------------------------


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics for the ``events`` stream: per
    event_type row count, share of total, and rank — the report you run
    before choosing salting factors for a 100 TB shuffle.  The window
    functions run over the already-aggregated (tiny) frame, never the
    raw events."""
    cat = Catalog(spark, sf_dir)
    agg = cat["events"].groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    w_all = Window.partitionBy()
    return agg.select(
        "event_type",
        "n_events",
        F.round(F.col("n_events") / F.sum("n_events").over(w_all), 6).alias("share"),
        F.rank().over(Window.orderBy(F.desc("n_events"), "event_type")).alias("skew_rank"),
    )


_SQL_SKEW_REPORT = """
WITH agg AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type)
SELECT event_type,
       n_events,
       round(n_events * 1.0 / sum(n_events) OVER (), 6) AS share,
       CAST(rank() OVER (ORDER BY n_events DESC, event_type) AS INT) AS skew_rank
FROM agg
"""


# ---------------------------------------------------------------------------
# Anomaly flagging via per-group z-score
# ---------------------------------------------------------------------------


def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 2.5 population standard deviations from
    their event_type mean.  Stats are aggregated once (tiny frame) and
    broadcast back onto the scan — two passes over events but no wide
    shuffle of the raw rows, vs. a window which would shuffle-sort
    everything by event_type.

    ``try_divide`` (not ``/``): under Spark 4's default ANSI mode a
    constant-valued group (sigma == 0) would make the plain division
    throw DIVIDE_BY_ZERO at runtime; try_divide yields NULL z, which
    the |z| > 2.5 predicate drops — a degenerate group has no outliers
    by definition.  Identical output wherever sigma != 0 (found by the
    round-5 property battery, not by the fixed datasets, where every
    event_type has spread)."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    z = F.try_divide(F.col("value") - F.col("mu"), F.col("sigma"))
    return (
        joined.where(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


_SQL_ANOMALY_ZSCORE = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY event_type)
SELECT event_id, e.event_type,
       round(value, 4) AS value,
       round((value - mu) / sigma, 4) AS zscore
FROM events e JOIN stats USING (event_type)
WHERE abs((value - mu) / sigma) > 2.5
"""


# ---------------------------------------------------------------------------
# Incremental-ingest watermark report
# ---------------------------------------------------------------------------


def q_incr_ingest_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion audit: with the checkpoint watermark defined
    as (global max ts − 1 day), report per event_type how many rows are
    new since the watermark vs already ingested, plus the type's own max
    ts.  The watermark is a driver-side scalar (one parquet-statistics
    max, bounded) — the alternative, a global window over raw events,
    would funnel everything through one task."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    # empty input: max(ts) is NULL -> any watermark works (both sides
    # of the new/old split are empty); epoch keeps the arithmetic total
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = (max_ts or _dt.datetime(1970, 1, 1)) - _dt.timedelta(days=1)
    return ev.groupBy("event_type").agg(
        F.sum((F.col("ts") > F.lit(wm)).cast("long")).alias("n_new"),
        F.sum((F.col("ts") <= F.lit(wm)).cast("long")).alias("n_old"),
        F.max("ts").alias("type_max_ts"),
    )


_SQL_INCR_WATERMARK = """
WITH wm AS (SELECT max(ts) - INTERVAL 1 DAY AS w FROM events)
SELECT event_type,
       CAST(sum(CASE WHEN ts > (SELECT w FROM wm) THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN ts <= (SELECT w FROM wm) THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
       max(ts) AS type_max_ts
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Substring-duplication coverage (positional 8-gram dedup signal)
# ---------------------------------------------------------------------------

_SUB_N = 8


def q_dedup_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document substring-duplication coverage: the fraction of
    positional 8-gram windows whose exact 8-gram also occurs elsewhere
    in the corpus — the per-position signal behind suffix-array-style
    training-data dedup, at n-gram granularity.

    Scale shape: two shuffles total — (1) group exploded windows by an
    8-byte xxhash64 key to count global frequency (the oracle groups the
    raw shingle string: identical counts modulo astronomically unlikely
    64-bit collisions), (2) group back by doc_id.  Candidate volume is
    positions, not pairs: O(total tokens), never O(docs²)."""
    cat = Catalog(spark, sf_dir)
    # stage the token array first: lambdas are not CSE'd, so
    # slice(tokens(text), i, 8) would re-split the whole text per
    # window — O(doc_len²) per doc (the quantize_int8 lesson)
    staged = cat["documents"].select(
        "doc_id", text.tokens(F.col("text")).alias("__t")
    )
    toks = F.col("__t")
    n = F.size(toks)
    # guard: F.sequence(1, 0) DESCENDS in Spark (step defaults to -1),
    # so short docs must take the empty-array branch explicitly
    windows = F.when(
        n >= _SUB_N,
        F.transform(
            F.sequence(F.lit(1), n - (_SUB_N - 1)),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i, _SUB_N), " ")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # explode_outer keeps short docs (empty window array -> one null
    # row), so the zero rows ride the same single scan instead of a
    # second documents pass; null keys collapse into one harmless
    # window partition whose freq is never used
    pos = staged.select("doc_id", F.explode_outer(windows).alias("w"))
    # one shuffle on w (window count) instead of groupBy(w) + re-explode
    # + shuffle join: the corpus is exploded and hashed exactly once
    freq = F.count(F.lit(1)).over(Window.partitionBy("w"))
    per_doc = (
        pos.withColumn("freq", freq)
        .groupBy("doc_id")
        .agg(
            F.count("w").alias("n_windows"),
            F.sum((F.col("w").isNotNull() & (F.col("freq") > 1)).cast("long")).alias(
                "n_dup_windows"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        F.when(
            F.col("n_windows") > 0,
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def _sub_parts(n: int) -> str:
    return ", ".join(f"t[i + {j}]" for j in range(n))


_SQL_SUBSTRING_COVERAGE = f"""
WITH toks AS (SELECT doc_id, {_RAW_TOKS} AS t FROM documents),
pos AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - {_SUB_N - 1}, 0)),
                               i -> concat_ws(' ', {_sub_parts(_SUB_N)}))) AS w
  FROM toks),
freq AS (SELECT w, count(*) AS freq FROM pos GROUP BY w),
per_doc AS (
  SELECT doc_id, count(*) AS n_windows,
         CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
  FROM pos JOIN freq USING (w)
  GROUP BY doc_id)
SELECT doc_id, n_windows, n_dup_windows,
       round(n_dup_windows * 1.0 / n_windows, 6) AS dup_frac
FROM per_doc
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS n_windows, CAST(0 AS BIGINT) AS n_dup_windows, 0.0 AS dup_frac
FROM toks WHERE len(t) < {_SUB_N}
"""


# ---------------------------------------------------------------------------
# Embedding norm statistics per label
# ---------------------------------------------------------------------------


def q_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics over the embeddings table — the
    sanity report before cosine ANN (un-normalized vectors silently
    break inner-product shortcuts).  Norms are pure column expressions
    (zip_with/aggregate fold, JVM-side); per-norm rounding to 6 decimals
    happens BEFORE the cross-row avg so both engines aggregate identical
    doubles."""
    cat = Catalog(spark, sf_dir)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(e, e, lambda a, b: a * b),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )
    return (
        cat["embeddings"]
        .select("label", F.round(norm, 6).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )


_SQL_EMBED_NORM_STATS = """
WITH norms AS (
  SELECT label,
         round(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
  FROM embeddings)
SELECT label, count(*) AS n_vecs,
       round(avg(norm), 4) AS avg_norm,
       round(min(norm), 4) AS min_norm,
       round(max(norm), 4) AS max_norm
FROM norms
GROUP BY label
"""


# ---------------------------------------------------------------------------
# SQL surface: GROUP BY ALL, UNPIVOT
# ---------------------------------------------------------------------------


def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+/DuckDB): every non-aggregate select item
    becomes a grouping key — same plan as an explicit GROUP BY."""
    cat = Catalog(spark, sf_dir)
    cat["lineitem"].createOrReplaceTempView("_gba_lineitem")
    try:
        return spark.sql(
            """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM _gba_lineitem
            GROUP BY ALL
            """
        )
    finally:
        spark.catalog.dropTempView("_gba_lineitem")


_SQL_GROUP_BY_ALL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ALL
"""


def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT of a per-nation measure table (melt).  Uses the
    DataFrame ``unpivot`` API (Spark 3.4+); the oracle uses DuckDB's
    standard UNPIVOT clause — both produce (n_name, metric, val)."""
    cat = Catalog(spark, sf_dir)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    wide = (
        cat["customer"]
        .join(cat["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            # integer cents: exact cross-engine arithmetic (float sums
            # round differently at .xx5 boundaries between engines)
            F.sum(cents).alias("total_cents"),
            F.floor(F.sum(cents) / F.count(F.lit(1))).alias("avg_cents"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["total_cents", "avg_cents", "n_customers"],
        variableColumnName="metric",
        valueColumnName="val",
    )


_SQL_AGG_UNPIVOT = """
WITH wide AS (
  SELECT n_name,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_cents,
         CAST(floor(sum(CAST(round(c_acctbal * 100) AS BIGINT)) * 1.0 / count(*)) AS BIGINT) AS avg_cents,
         count(*) AS n_customers
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name)
SELECT n_name, metric, val
FROM wide
UNPIVOT (val FOR metric IN (total_cents, avg_cents, n_customers))
"""


# ---------------------------------------------------------------------------
# Data-quality constraint report (Deequ-style checks)
# ---------------------------------------------------------------------------


def q_dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite in the Deequ style:
    completeness, key uniqueness, accepted-values, bounds, and
    referential integrity — each check one row of (check name, metric,
    pass/fail).  Per-table checks fold into a single aggregate per scan;
    the referential check is a broadcast-able anti-join count.  All
    metrics are exact integer ratios (deterministic cross-engine)."""
    cat = Catalog(spark, sf_dir)
    orders, li = cat["orders"], cat["lineitem"]

    def report(name: str, metric: F.Column, threshold: float) -> F.Column:
        m = F.round(metric, 6)
        return F.struct(
            F.lit(name).alias("check_name"),
            m.alias("metric"),
            F.when(m >= threshold, F.lit("pass")).otherwise(F.lit("fail")).alias("status"),
        )

    o_checks = orders.agg(
        F.array(
            # try_divide everywhere: on an EMPTY table every ratio is
            # NULL (ANSI / would throw), and report() marks a NULL
            # metric "fail" -- no data is a failed check, not a crash
            report(
                "orders.o_custkey.completeness",
                F.try_divide(F.count("o_custkey"), F.count(F.lit(1))),
                1.0,
            ),
            report(
                "orders.o_orderkey.uniqueness",
                F.try_divide(F.count_distinct("o_orderkey"), F.count(F.lit(1))),
                1.0,
            ),
            report(
                "orders.o_orderstatus.accepted_values",
                F.try_divide(
                    F.sum(F.col("o_orderstatus").isin("O", "F", "P").cast("long")),
                    F.count(F.lit(1)),
                ),
                1.0,
            ),
            report(
                "orders.o_totalprice.non_negative",
                F.try_divide(
                    F.sum((F.col("o_totalprice") >= 0).cast("long")),
                    F.count(F.lit(1)),
                ),
                1.0,
            ),
        ).alias("arr")
    ).select(F.explode("arr").alias("r"))
    ref_metric = F.try_divide(F.count("o_orderkey"), F.count(F.lit(1)))
    ref_check = (
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left",
        )
        .agg(F.array(report("lineitem.l_orderkey.ref_orders", ref_metric, 1.0)).alias("arr"))
        .select(F.explode("arr").alias("r"))
    )
    return o_checks.unionByName(ref_check).select("r.check_name", "r.metric", "r.status")


_SQL_DQ_REPORT = """
WITH o AS (
  SELECT count(*) AS n, count(o_custkey) AS n_cust,
         count(DISTINCT o_orderkey) AS n_key,
         sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS n_status,
         sum(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS n_pos
  FROM orders),
r AS (
  SELECT count(*) AS n, count(o.o_orderkey) AS n_matched
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
m AS (
  SELECT 'orders.o_custkey.completeness' AS check_name,
         round(n_cust * 1.0 / n, 6) AS metric FROM o
  UNION ALL
  SELECT 'orders.o_orderkey.uniqueness', round(n_key * 1.0 / n, 6) FROM o
  UNION ALL
  SELECT 'orders.o_orderstatus.accepted_values', round(n_status * 1.0 / n, 6) FROM o
  UNION ALL
  SELECT 'orders.o_totalprice.non_negative', round(n_pos * 1.0 / n, 6) FROM o
  UNION ALL
  SELECT 'lineitem.l_orderkey.ref_orders', round(n_matched * 1.0 / n, 6) FROM r)
SELECT check_name, metric,
       CASE WHEN metric >= 1.0 THEN 'pass' ELSE 'fail' END AS status
FROM m
"""


# ---------------------------------------------------------------------------
# Entity resolution: blocked fuzzy join (levenshtein within block)
# ---------------------------------------------------------------------------


def q_er_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution join: a deterministically corrupted subset of
    part names (second character deleted, keys ≡ 0 mod 7) is matched
    back to the clean catalog by BLOCKING on the corruption-invariant
    last word, then exact levenshtein ≤ 2 within the block, best match
    = min (distance, partkey) via one window.

    Scale shape: DICTIONARY REDUCTION before the expensive part — both
    sides collapse to their distinct name domains first (the match
    depends only on the name), levenshtein runs on
    |distinct-dirty|×|distinct-clean-in-block| pairs, and the per-name
    verdict joins back onto the full key stream as a broadcast.  The
    blocked equi-join already bounds pairs below all-pairs |A|×|B|;
    the dictionary cut removes the row-multiplicity factor on top
    (measured 6.3 s → sub-second at sf0.1: 20k part rows share only
    64 distinct names).  At 100 TB: same two moves — block, then
    dedupe the join domains."""
    cat = Catalog(spark, sf_dir)
    parts = cat["part"]
    block = F.regexp_extract(F.col("p_name"), "[^ ]+$", 0)
    dirty_rows = parts.where(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("dirty_key"),
        F.concat(
            F.substring("p_name", 1, 1), F.expr("substring(p_name, 3)")
        ).alias("dirty_name"),
        block.alias("block"),
    )
    dirty_names = dirty_rows.select("dirty_name", "block").distinct()
    # per distinct clean name keep the minimum key: the (lev, cand_key)
    # tie-break only ever selects a name's smallest key, so this is an
    # exact reduction, not an approximation
    clean_names = parts.groupBy(
        F.col("p_name").alias("cand_name"), block.alias("block")
    ).agg(F.min("p_partkey").alias("cand_key"))
    lev = F.levenshtein("dirty_name", "cand_name")
    cands = (
        dirty_names.join(clean_names, "block")
        .where(lev <= 2)
        .select(
            "dirty_name", "block", "cand_key", "cand_name",
            lev.cast("long").alias("lev"),
        )
    )
    # best match is resolved per (dirty_name, block), and the join back
    # carries block too: if one corrupted name ever arose from originals
    # with different blocking keys, each block keeps its own winner —
    # matching the oracle's per-dirty_key-within-block semantics
    w = Window.partitionBy("dirty_name", "block").orderBy("lev", "cand_key")
    best = (
        cands.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return dirty_rows.join(F.broadcast(best), ["dirty_name", "block"]).select(
        "dirty_key", "dirty_name", "cand_key", "cand_name", "lev"
    )


_SQL_ER_FUZZY_JOIN = """
WITH corrupted AS (
  SELECT p_partkey AS dirty_key,
         substr(p_name, 1, 1) || substr(p_name, 3) AS dirty_name,
         regexp_extract(p_name, '[^ ]+$', 0) AS block
  FROM part WHERE p_partkey % 7 = 0),
clean AS (
  SELECT p_partkey AS cand_key, p_name AS cand_name,
         regexp_extract(p_name, '[^ ]+$', 0) AS block
  FROM part),
cands AS (
  SELECT dirty_key, dirty_name, cand_key, cand_name,
         levenshtein(dirty_name, cand_name) AS lev
  FROM corrupted JOIN clean USING (block)
  WHERE levenshtein(dirty_name, cand_name) <= 2)
SELECT dirty_key, dirty_name, cand_key, cand_name, CAST(lev AS BIGINT) AS lev
FROM (SELECT *, row_number() OVER (PARTITION BY dirty_key ORDER BY lev, cand_key) AS rn
      FROM cands)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# File-layout report from scan metadata
# ---------------------------------------------------------------------------

_LAYOUT_TABLES = ["orders", "lineitem", "documents"]


def q_file_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files / layout audit: per input parquet file, row count via
    the hidden ``_metadata`` scan column — the report that drives
    compaction planning (a 100 TB table shredded into KB-size files is
    an open-file-handle and scheduler-overhead disaster; target-size
    compaction fixes it).  Columnless scan: only file metadata and the
    grouping key are materialized."""
    cat = Catalog(spark, sf_dir)
    out = None
    for t in _LAYOUT_TABLES:
        df = (
            spark.read.parquet(cat.path(t))
            .select(
                F.lit(t).alias("table_name"),
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                    "file_name"
                ),
            )
            .groupBy("table_name", "file_name")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        out = df if out is None else out.unionByName(df)
    return out


def _layout_sql() -> str:
    # the testdata layout is one parquet file per table named
    # '{table}.parquet', so the oracle derives file_name as a literal
    # and counts through the registered view — no filesystem access
    selects = [
        f"SELECT '{t}' AS table_name, '{t}.parquet' AS file_name, "
        f"count(*) AS n_rows FROM {t}"
        for t in _LAYOUT_TABLES
    ]
    return "\nUNION ALL\n".join(selects)


_SQL_FILE_LAYOUT = _layout_sql()


# ---------------------------------------------------------------------------
# Winsorized robust mean per group
# ---------------------------------------------------------------------------


def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clipped) robust mean of event values per
    event_type.  Exact interpolated percentiles aggregate once per group
    (tiny frame), broadcast back onto the scan for clipping — the same
    two-pass no-raw-shuffle shape as the z-score anomaly query."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    pcts = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.05)).alias("p05"),
        F.percentile(F.col("value"), F.lit(0.95)).alias("p95"),
    )
    clipped = ev.join(F.broadcast(pcts), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias("wv"),
        (F.col("value") < F.col("p05")).cast("long").alias("lo"),
        (F.col("value") > F.col("p95")).cast("long").alias("hi"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lo").alias("n_clipped_lo"),
        F.sum("hi").alias("n_clipped_hi"),
        F.round(F.avg("wv"), 4).alias("mean_winsorized"),
    )


_SQL_EVENTS_WINSORIZE = """
WITH pcts AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type)
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(sum(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       round(avg(least(greatest(value, p05), p95)), 4) AS mean_winsorized
FROM events JOIN pcts USING (event_type)
GROUP BY event_type
"""


def ext10_queries() -> dict:
    return {
        "docpipe_gopher_rules": q_docpipe_gopher_rules,
        "split_train_valid_test": q_split_train_valid_test,
        "heavy_hitters_tokens": q_heavy_hitters_tokens,
        "token_length_histogram": q_token_length_histogram,
        "skew_report": q_skew_report,
        "events_anomaly_zscore": q_events_anomaly_zscore,
        "incr_ingest_watermark": q_incr_ingest_watermark,
        "dedup_substring_coverage": q_dedup_substring_coverage,
        "embed_norm_stats": q_embed_norm_stats,
        "sql_group_by_all": q_sql_group_by_all,
        "agg_unpivot_grouped": q_agg_unpivot,
        "dq_constraint_report": q_dq_constraint_report,
        "er_fuzzy_join": q_er_fuzzy_join,
        "file_layout_report": q_file_layout_report,
        "events_winsorize": q_events_winsorize,
    }


def ext10_oracles() -> dict:
    return {
        "docpipe_gopher_rules": _SQL_GOPHER_RULES,
        "split_train_valid_test": _SQL_SPLIT,
        "heavy_hitters_tokens": _SQL_HEAVY_HITTERS,
        "token_length_histogram": _SQL_TOKEN_HISTOGRAM,
        "skew_report": _SQL_SKEW_REPORT,
        "events_anomaly_zscore": _SQL_ANOMALY_ZSCORE,
        "incr_ingest_watermark": _SQL_INCR_WATERMARK,
        "dedup_substring_coverage": _SQL_SUBSTRING_COVERAGE,
        "embed_norm_stats": _SQL_EMBED_NORM_STATS,
        "sql_group_by_all": _SQL_GROUP_BY_ALL,
        "agg_unpivot_grouped": _SQL_AGG_UNPIVOT,
        "dq_constraint_report": _SQL_DQ_REPORT,
        "er_fuzzy_join": _SQL_ER_FUZZY_JOIN,
        "file_layout_report": _SQL_FILE_LAYOUT,
        "events_winsorize": _SQL_EVENTS_WINSORIZE,
    }
