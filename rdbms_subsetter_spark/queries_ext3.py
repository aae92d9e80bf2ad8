"""Graded queries, part 4: the subquery surface (EXISTS / IN+HAVING /
scalar — Catalyst's decorrelation paths), GROUPING SETS, value-window
functions (first/last/nth), higher-order array functions, the scalar
Arrow pandas-UDF shape, two-level aggregation (TPC-H Q13 shape), and
streaming deduplication.

Same contract as queries_core/ext/ext2: identical column aliases on
both engines, floats rounded on both sides (JVM-side ``F.round``,
never numpy).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import text
from rdbms_subsetter_spark.queries_ext import (
    _EN_STOP,
    _NORM,
    _RAW_TOKS,
    _capped_shingle_cte,
    _shingle_cte,
    NGRAM_MAX_DOC_FREQ,
)
from rdbms_subsetter_spark.streaming import events as streaming_events


# ---------------------------------------------------------------------------
# subqueries: EXISTS / IN+HAVING / scalar
# ---------------------------------------------------------------------------


def q_sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape, adapted to the slimmed schema):
    priority counts over 1996 orders having at least one discounted line.

    Catalyst's RewritePredicateSubquery turns the EXISTS into a LEFT
    SEMI join — same physical plan as the FK-closure semi-joins, reached
    from the SQL surface instead of the DataFrame API.
    """
    cat = Catalog(spark, sf_dir)
    for t in ("orders", "lineitem"):
        cat[t].createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        GROUP BY o_orderpriority
        """
    )


def q_join_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery with HAVING (TPC-H Q18 shape): customers whose orders
    total > 200 quantity units.

    DataFrame form: the HAVING is an aggregate-then-filter, the IN is a
    left_semi join against the filtered key set — the aggregated side is
    tiny after the filter, so AQE broadcasts the semi join.
    """
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)  # HAVING
        .select("l_orderkey")
    )
    orders = cat["orders"].join(
        big, F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def q_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the global average balance, with
    their distance from it.  Catalyst plans the subquery once (a
    one-row broadcast), not per-row."""
    cat = Catalog(spark, sf_dir)
    cat["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               round(c_acctbal - (SELECT avg(c_acctbal) FROM customer), 2)
                 AS above_avg
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


# ---------------------------------------------------------------------------
# aggregation: GROUPING SETS, two-level (Q13 custdist)
# ---------------------------------------------------------------------------


def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN INTERVAL window: per user, events and value-sum in
    the trailing hour — the time-based sliding frame (vs the row frame
    in window_lag_lead_ntile)."""
    cat = Catalog(spark, sf_dir)
    cat["events"].createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               count(*) OVER w AS n_trailing_1h,
               round(sum(value) OVER w, 2) AS sum_trailing_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: correlation, covariance, stddev,
    variance, and boolean aggregates per returnflag."""
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_pop("l_quantity"), 6).alias("var_qty"),
        F.bool_and(F.col("l_discount") < 0.5).alias("all_mild_discount"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
    )


def q_agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregation: per nation, the sorted distinct set
    of customer market segments (collect_set made deterministic by
    array_sort) and the customer count.  Serialized to CSV at the query
    boundary (driver canonicalizer cannot hash list cells)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["customer"]
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt (the inverse of pivot): wide part metrics to long
    (p_partkey, metric, val) — an Expand ×2 inside the scan stage, no
    shuffle."""
    cat = Catalog(spark, sf_dir)
    wide = cat["part"].select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn("val", F.round("val", 2))


def q_sql_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a NULLABLE subquery — three-valued logic makes this a
    distinct physical operator (null-aware anti join: BHJ LeftAnti with
    the isNullAware flag, checked in tests/test_scale_plans.py).  The
    nullif() never fires at runtime, but its nullable TYPE forces the
    null-aware plan."""
    cat = Catalog(spark, sf_dir)
    for t in ("customer", "nation"):
        cat[t].createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey FROM customer
        WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, -1)
                                  FROM nation WHERE n_regionkey = 1)
        """
    )


def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (multiplicity-preserving): INTERSECT ALL /
    EXCEPT ALL of the suppkey multisets of two lineitem slices."""
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"]
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "l_suppkey")  # noqa: E731
    both = tag(a.intersectAll(b), "intersect_all").unionByName(
        tag(a.exceptAll(b), "except_all")
    )
    return both.groupBy("op", "l_suppkey").agg(F.count(F.lit(1)).alias("multiplicity"))


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE compile to):
    (flag, status), (flag), and grand total — one Expand, one shuffle."""
    cat = Catalog(spark, sf_dir)
    cat["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping_id() AS INT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


def q_agg_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation (TPC-H Q13): order-count distribution over
    customers, LEFT join with a non-equi LIKE residual in the join
    condition (urgent orders excluded *inside* the join, so customers
    with only urgent orders still count as 0)."""
    cat = Catalog(spark, sf_dir)
    orders = cat["orders"]
    per_cust = (
        cat["customer"]
        .join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & ~F.col("o_orderpriority").like("%URGENT%"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# windows: first_value / last_value / nth_value
# ---------------------------------------------------------------------------


def q_window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions per customer order history: first order's
    price, last (full-frame), and second (running frame, NULL until two
    rows are visible).  Deterministic tiebreak on o_orderkey."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cat["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first_value("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last_value("o_totalprice").over(w_full), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


# ---------------------------------------------------------------------------
# higher-order array functions
# ---------------------------------------------------------------------------


def q_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda (higher-order) array functions over embeddings — all
    codegen, no UDF: filter, exists, transform, zip_with fold.
    Arithmetic in double (float32→float64 widening is exact)."""
    from rdbms_subsetter_spark.operators.similarity import dot

    cat = Catalog(spark, sf_dir)
    e = F.col("embedding")
    pos = F.filter(e, lambda x: x > 0)
    return cat["embeddings"].select(
        "vec_id",
        F.size(pos).alias("n_pos"),
        F.round(
            F.aggregate(pos, F.lit(0.0), lambda a, x: a + x.cast("double")), 6
        ).alias("sum_pos"),
        F.exists(e, lambda x: x > 0.9).alias("has_big"),
        F.round(
            F.array_max(F.transform(e, lambda x: x.cast("double") * x.cast("double"))),
            6,
        ).alias("max_sq"),
        F.round(dot(e, F.reverse(e)), 6).alias("rev_dot"),
    )


# ---------------------------------------------------------------------------
# lateral expansion / multi-resolution rollup / end-to-end doc pipeline
# ---------------------------------------------------------------------------


def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (ordinal lateral expansion) of part names into words —
    the built-in Generate operator (vs the Python-UDTF path): narrow,
    no shuffle, pipelined inside the scan stage."""
    cat = Catalog(spark, sf_dir)
    return cat["part"].select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("word_idx", "word"),
    )


def q_events_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (the hypertable pattern): daily
    aggregates computed FROM the hourly aggregates, not from raw events.

    At 100 TB the hourly layer is the materialized continuous aggregate;
    every coarser resolution (day/week/month) is a cheap second-level
    rollup over it — count→sum(count), sum→sum(sum).  The oracle
    aggregates raw events directly, proving the two-level reassociation
    is exact."""
    cat = Catalog(spark, sf_dir)
    hourly = (
        cat["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("hour_ts")).alias("day_ts"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("v"), 2).alias("sum_value"),
        )
    )


def q_docpipe_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline: language filter → quality
    scoring → exact dedup (keep lowest doc_id per fingerprint).

    The composition a 100 TB pretraining-corpus job actually runs; all
    scoring is codegen expressions, the only shuffle is the dedup
    window on the fingerprint."""
    cat = Catalog(spark, sf_dir)
    t = F.col("text")
    scored = cat["documents"].select(
        "doc_id",
        "lang",
        "n_chars",
        text.quality_score(t).alias("quality"),
        text.fingerprint(t).alias("fp"),
    )
    kept = scored.filter((F.col("lang") == "en") & (F.col("quality") >= 0.5))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars", "quality")
    )


def q_sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AGGREGATE subquery: parts priced above their
    own brand's average.  Catalyst decorrelates it into a grouped
    aggregate joined back on the correlation key — never a per-row
    subquery execution."""
    cat = Catalog(spark, sf_dir)
    cat["part"].createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand,
               round(p_retailprice - (SELECT avg(p2.p_retailprice) FROM part p2
                                      WHERE p2.p_brand = p.p_brand), 2)
                 AS above_brand_avg
        FROM part p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
        """
    )


def q_dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the n-gram-Jaccard
    pair graph (threshold 0.5) — the step that turns pairwise similarity
    into dedup groups at corpus scale.  The oracle proves the result
    equals the transitive closure via a recursive CTE.

    Round-7 graded configuration — both scale levers on:

    * the pair graph is the CAPPED jaccard join (hot shingles with
      df > NGRAM_MAX_DOC_FREQ dropped, oracle in lockstep), bounding
      candidate volume linearly instead of the Σdf² fan the ×8 stress
      measured at 14×;
    * the component engine is the alternating large-star/small-star
      contraction (O(log² n) rounds regardless of component diameter —
      the production choice for chain-shaped near-dup graphs, where
      min-label propagation pays O(diameter) shuffles).  The minlabel
      engine stays graded as ``dedup_cc_clusters_minlabel``
      (queries_ext16); both are property-tested equivalent against an
      independent union-find."""
    from rdbms_subsetter_spark.operators import dedup
    from rdbms_subsetter_spark.queries_ext import NGRAM_MAX_DOC_FREQ

    cat = Catalog(spark, sf_dir)
    edges = dedup.ngram_jaccard_pairs(
        cat["documents"], n=3, threshold=0.5, max_doc_freq=NGRAM_MAX_DOC_FREQ
    )
    return dedup.connected_components(edges, algorithm="star").withColumnRenamed(
        "node", "doc_id"
    )


def q_merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert as a snapshot rewrite (the parquet-native form of
    ``MERGE INTO``): latest event value per user upserted into the
    customer snapshot — matched rows updated, unmatched base rows kept,
    unmatched updates inserted.

    Latest-per-key via max_by on (ts, event_id); the merge itself is a
    single full-outer join on the key.  At scale both sides shuffle on
    the key once; with a bucketed base table the join is shuffle-free.
    """
    cat = Catalog(spark, sf_dir)
    latest = (
        cat["events"]
        .groupBy(F.col("user_id").alias("key"))
        .agg(
            F.round(
                F.max_by(F.col("value"), F.struct(F.col("ts"), F.col("event_id"))), 2
            ).alias("new_val")
        )
    )
    base = cat["customer"].select(
        F.col("c_custkey").alias("key"), F.round(F.col("c_acctbal"), 2).alias("old_val")
    )
    return base.join(latest, on="key", how="full_outer").select(
        "key",
        F.coalesce("new_val", "old_val").alias("balance"),
        F.col("new_val").isNotNull().alias("updated"),
        F.col("old_val").isNull().alias("inserted"),
    )


def q_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings (4× storage shrink before
    ANN) — pure codegen array math, bit-exact vs the oracle."""
    from rdbms_subsetter_spark.operators.similarity import quantize_int8

    cat = Catalog(spark, sf_dir)
    q = quantize_int8(cat["embeddings"])
    # serialize the int8 vector to CSV at the query boundary: the
    # driver's pandas canonicalizer cannot hash list-valued cells
    return q.withColumn(
        "q_vec",
        F.array_join(F.transform("q_vec", lambda x: x.cast("string")), ","),
    )


def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking of documents (50-token chunks,
    stride 40) — the corpus → training-example expansion step."""
    cat = Catalog(spark, sf_dir)
    return text.chunk_windows(cat["documents"], chunk_tokens=50, stride=40)


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into 512-token context bins via distributed
    two-pass prefix sum (range partitions + broadcast offsets) — the
    oracle's single global window proves the distributed cumsum exact."""
    cat = Catalog(spark, sf_dir)
    return text.pack_sequences(cat["documents"], capacity=512)


# ---------------------------------------------------------------------------
# UDF surface: scalar Arrow pandas UDF
# ---------------------------------------------------------------------------


def q_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``pandas_udf`` over events.value (Arrow batch in, numpy
    vectorized, Arrow batch out) — pure-arithmetic cubic so the result
    is bit-exact vs the oracle."""
    from rdbms_subsetter_spark.functions import horner_cubic

    cubic = horner_cubic()
    cat = Catalog(spark, sf_dir)
    return cat["events"].select(
        "event_id",
        F.round(cubic(F.col("value")), 6).alias("cubic_val"),
    )


# ---------------------------------------------------------------------------
# sources: directory-partitioned parquet + partition pruning
# ---------------------------------------------------------------------------


def q_partitioned_source_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → parquet partitioned by lang → read back filtered to
    two languages.  The filter prunes partition DIRECTORIES at planning
    time (plan shows PartitionFilters, scan reads 2/5 of the files) —
    the layout that keeps selective scans O(selected) at 100 TB.
    Pruning shape asserted in tests/test_scale_plans.py."""
    from rdbms_subsetter_spark.sources.io import partitioned_roundtrip

    cat = Catalog(spark, sf_dir)
    rt = partitioned_roundtrip(cat["documents"], "lang", tag=f"{sf_dir}/documents")
    return (
        rt.filter(F.col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: lineitem has only 3 returnflag
    groups (worst-case key skew — every row lands on 3 reducers), so
    the salted form partial-aggregates on (key, salt) first.  The
    oracle is the PLAIN group-by: salting must be invisible in the
    result."""
    from rdbms_subsetter_spark.partitioning import salted_agg

    cat = Catalog(spark, sf_dir)
    out = salted_agg(
        cat["lineitem"], ["l_returnflag"], {"l_quantity": "sum_qty"}, salt=16
    )
    return out.select(
        "l_returnflag", "n_rows", F.round("sum_qty", 2).alias("sum_qty")
    )


def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join: orders and lineitem bucketed on the
    join key (8 buckets, sorted), joined WITHOUT any exchange — the
    pre-partitioned layout that makes the recurring fact-fact join at
    100 TB a map-side merge.  Zero-shuffle shape asserted in
    tests/test_scale_plans.py; the oracle is the plain join."""
    import hashlib

    from rdbms_subsetter_spark.partitioning import write_bucketed
    from rdbms_subsetter_spark.session import pin_session_conf

    import shutil
    from urllib.parse import urlparse

    pin_session_conf(spark)
    cat = Catalog(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    ob, lb = f"orders_bq_{tag}", f"lineitem_bq_{tag}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (ob, lb):
        # a prior PROCESS may have left the managed location on disk while
        # this session's in-memory catalog has no such table — saveAsTable
        # then raises LOCATION_ALREADY_EXISTS; drop both sides first
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    write_bucketed(cat["orders"], ob, ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(cat["lineitem"], lb, ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        spark.table(lb)
        .join(spark.table(ob), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
    )


def q_orc_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC → read back → aggregate; the oracle reads the
    original parquet, so any columnar-format round-trip loss breaks
    the hash."""
    from rdbms_subsetter_spark.sources.io import orc_roundtrip

    cat = Catalog(spark, sf_dir)
    rt = orc_roundtrip(cat["orders"], tag=f"{sf_dir}/orders")
    return rt.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-filling: per-type hourly spine (sequence +
    explode), left join the hourly aggregates, forward-fill the value
    with last_value(ignoreNulls) — the interpolation operator Spark
    has no builtin for, composed from three primitives.

    At scale the spine is generated, never materialized from data, and
    the forward-fill window shuffles once on the series key."""
    cat = Catalog(spark, sf_dir)
    hourly = (
        cat["events"]
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_ts"
            ),
        )
    )
    joined = spine.join(hourly, on=["event_type", "hour_ts"], how="left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour_ts",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.round(F.last_value("v", ignoreNulls=True).over(w), 2).alias("v_filled"),
    )


# ---------------------------------------------------------------------------
# streaming: dedup
# ---------------------------------------------------------------------------


def q_streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates over the replayed event stream; bounded
    replay makes the emitted set equal batch DISTINCT → oracle-checked."""
    return streaming_events.streaming_dedup_keys(spark, sf_dir)


def q_streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join + complete-mode aggregation;
    bounded replay ≡ the batch join+agg → oracle-checked."""
    return streaming_events.streaming_static_join(spark, sf_dir)


def q_streaming_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch parquet sink (batchId-keyed idempotent writes),
    read back and aggregated; bounded replay ≡ the batch filter →
    oracle-checked."""
    return streaming_events.streaming_foreachbatch_sink(spark, sf_dir)


def q_scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe scalar surface: try_divide / try_cast return NULL
    where strict evaluation would raise — the semantics batch pipelines
    need to survive dirty data without per-row exception handling."""
    cat = Catalog(spark, sf_dir)
    return cat["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 4).alias(
            "price_per_discount"  # NULL where discount = 0
        ),
        F.try_divide(F.lit(1.0), F.col("l_tax") - F.col("l_tax")).alias("div_zero"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),  # NULL
        F.col("l_orderkey").cast("string").try_cast("int").alias("key_roundtrip"),
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def ext3_queries() -> dict:
    return {
        "sql_exists_subquery": q_sql_exists_subquery,
        "join_in_having": q_join_in_having,
        "sql_scalar_subquery": q_sql_scalar_subquery,
        "agg_grouping_sets": q_agg_grouping_sets,
        "agg_custdist": q_agg_custdist,
        "embed_quantize_int8": q_embed_quantize_int8,
        "doc_chunk_windows": q_doc_chunk_windows,
        "doc_pack_sequences": q_doc_pack_sequences,
        "window_first_last_nth": q_window_first_last_nth,
        "array_higher_order": q_array_higher_order,
        "udf_scalar_pandas": q_udf_scalar_pandas,
        "sql_correlated_scalar": q_sql_correlated_scalar,
        "sql_not_in_null_aware": q_sql_not_in_null_aware,
        "agg_unpivot": q_agg_unpivot,
        "agg_collect_set": q_agg_collect_set,
        "window_time_range": q_window_time_range,
        "agg_stats_moments": q_agg_stats_moments,
        "set_ops_all": q_set_ops_all,
        "dedup_cc_clusters": q_dedup_cc_clusters,
        "merge_upsert_latest": q_merge_upsert_latest,
        "explode_posexplode": q_explode_posexplode,
        "events_rollup_daily": q_events_rollup_daily,
        "docpipe_quality_filter": q_docpipe_quality_filter,
        "partitioned_source_prune": q_partitioned_source_prune,
        "agg_salted_skew": q_agg_salted_skew,
        "orc_source_agg": q_orc_source_agg,
        "join_bucketed": q_join_bucketed,
        "events_gapfill": q_events_gapfill,
        "streaming_dedup_keys": q_streaming_dedup_keys,
        "streaming_static_join": q_streaming_static_join,
        "streaming_foreachbatch": q_streaming_foreachbatch,
        "scalar_try_functions": q_scalar_try_functions,
    }


def ext3_oracles() -> dict:
    return {
        "sql_exists_subquery": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
""",
        "join_in_having": """
SELECT c_name, o_orderkey, o_totalprice, o_orderdate,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
GROUP BY c_name, o_orderkey, o_totalprice, o_orderdate
""",
        "sql_scalar_subquery": """
SELECT c_custkey, c_mktsegment,
       round(c_acctbal - (SELECT avg(c_acctbal) FROM customer), 2) AS above_avg
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
""",
        "agg_grouping_sets": """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
        "agg_custdist": """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
  GROUP BY c_custkey)
GROUP BY c_count
""",
        "window_first_last_nth": """
SELECT o_orderkey, o_custkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS last_price,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
        "array_higher_order": """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       round(list_sum(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)), 6)
         AS sum_pos,
       len(list_filter(embedding, x -> x > 0.9)) > 0 AS has_big,
       round(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6)
         AS max_sq,
       round(list_dot_product(CAST(embedding AS DOUBLE[]),
                              list_reverse(CAST(embedding AS DOUBLE[]))), 6)
         AS rev_dot
FROM embeddings
""",
        "embed_quantize_int8": """
WITH m AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_min(CAST(embedding AS DOUBLE[])) AS mn,
         list_max(CAST(embedding AS DOUBLE[])) AS mx
  FROM embeddings)
SELECT vec_id,
       round(mn, 6) AS q_min,
       round((mx - mn) / 255.0, 9) AS q_scale,
       array_to_string(
         CASE WHEN mx = mn THEN list_transform(e, x -> 0)
              ELSE list_transform(e, x -> CAST(round((x - mn) / ((mx - mn) / 255.0)) AS INT))
         END, ',') AS q_vec
FROM m
""",
        "doc_chunk_windows": f"""
WITH t AS (SELECT doc_id, {_RAW_TOKS} AS l FROM documents)
SELECT doc_id,
       CAST(s // 40 AS INT) AS chunk_idx,
       CAST(len(list_slice(l, CAST(s + 1 AS INT), CAST(s + 50 AS INT))) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(l, CAST(s + 1 AS INT), CAST(s + 50 AS INT)), ' ') AS chunk_text
FROM t, unnest(range(0, greatest(len(l), 1), 40)) AS u(s)
""",
        "doc_pack_sequences": f"""
SELECT doc_id, n_tok,
       CAST(floor((cum - n_tok) * 1.0 / 512) AS INT) AS bin_id
FROM (SELECT doc_id, len({_RAW_TOKS}) AS n_tok,
             sum(len({_RAW_TOKS})) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents)
""",
        "udf_scalar_pandas": """
SELECT event_id,
       round(((value * 0.25 + 1.5) * value - 2.0) * value, 6) AS cubic_val
FROM events
""",
        "sql_correlated_scalar": """
SELECT p_partkey, p_brand,
       round(p_retailprice - (SELECT avg(p2.p_retailprice) FROM part p2
                              WHERE p2.p_brand = p.p_brand), 2) AS above_brand_avg
FROM part p
WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                       WHERE p2.p_brand = p.p_brand)
""",
        "agg_collect_set": """
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       count(*) AS n_cust
FROM customer GROUP BY c_nationkey
""",
        "window_time_range": """
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_trailing_1h,
       round(sum(value) OVER w, 2) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
        "agg_stats_moments": """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(var_pop(l_quantity), 6) AS var_qty,
       bool_and(l_discount < 0.5) AS all_mild_discount,
       bool_or(l_tax > 0.07) AS any_high_tax
FROM lineitem GROUP BY l_returnflag
""",
        "agg_unpivot": """
SELECT p_partkey, 'p_size' AS metric, round(CAST(p_size AS DOUBLE), 2) AS val
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', round(p_retailprice, 2) FROM part
""",
        "sql_not_in_null_aware": """
SELECT c_custkey, c_nationkey FROM customer
WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, -1)
                          FROM nation WHERE n_regionkey = 1)
""",
        "set_ops_all": """
SELECT op, l_suppkey, count(*) AS multiplicity FROM (
  SELECT 'intersect_all' AS op, l_suppkey FROM (
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')
  UNION ALL
  SELECT 'except_all' AS op, l_suppkey FROM (
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'))
GROUP BY op, l_suppkey
""",
        "dedup_cc_clusters": f"""
WITH RECURSIVE {_shingle_cte(3)},
{_capped_shingle_cte(NGRAM_MAX_DOC_FREQ)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT d1, d2
  FROM shared JOIN sizes n1 ON d1 = n1.doc_id JOIN sizes n2 ON d2 = n2.doc_id
  WHERE shared * 1.0 / (n1.n_sh + n2.n_sh - shared) >= 0.5),
sym AS (SELECT d1 AS src, d2 AS dst FROM pairs
        UNION SELECT d2, d1 FROM pairs),
walk(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, w.label FROM sym s JOIN walk w ON s.dst = w.node),
lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM lab
""",
        "merge_upsert_latest": """
WITH latest AS (
  SELECT user_id AS key, round(value, 2) AS new_val FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1),
base AS (SELECT c_custkey AS key, round(c_acctbal, 2) AS old_val FROM customer)
SELECT coalesce(base.key, latest.key) AS key,
       coalesce(new_val, old_val) AS balance,
       new_val IS NOT NULL AS updated,
       old_val IS NULL AS inserted
FROM base FULL OUTER JOIN latest ON base.key = latest.key
""",
        "explode_posexplode": """
SELECT p_partkey,
       CAST(i - 1 AS INT) AS word_idx,
       l[CAST(i AS INT)] AS word
FROM (SELECT p_partkey, string_split(p_name, ' ') AS l FROM part),
     unnest(range(1, len(l) + 1)) AS t(i)
""",
        "events_rollup_daily": """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
        "docpipe_quality_filter": f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         round((least(len({_RAW_TOKS}) / 100.0, 1.0)
               + least(len(list_filter({_RAW_TOKS}, t -> list_contains({_EN_STOP}, t))) * 1.0
                       / len({_RAW_TOKS}) * 5.0, 1.0)
               + greatest(0.0, 1.0 - ((length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                                       * 1.0 / length(text)) * 4.0)) / 3.0, 6) AS quality,
         md5({_NORM}) AS fp
  FROM documents),
kept AS (SELECT * FROM scored WHERE lang = 'en' AND quality >= 0.5)
SELECT doc_id, lang, n_chars, quality FROM (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept)
WHERE rn = 1
""",
        "partitioned_source_prune": """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang IN ('en', 'de')
GROUP BY lang, source
""",
        "streaming_dedup_keys": """
SELECT DISTINCT user_id, event_type FROM events
""",
        "agg_salted_skew": """
SELECT l_returnflag, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY l_returnflag
""",
        "join_bucketed": """
SELECT o_orderpriority,
       count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
        "orc_source_agg": """
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       min(o_orderdate) AS first_date,
       max(o_orderdate) AS last_date
FROM orders GROUP BY o_orderstatus
""",
        "events_gapfill": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         count(*) AS n, sum(value) AS v
  FROM events GROUP BY 1, 2),
bounds AS (SELECT event_type, min(hour_ts) AS lo, max(hour_ts) AS hi
           FROM hourly GROUP BY 1),
spine AS (SELECT event_type,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
          FROM bounds)
SELECT s.event_type,
       CAST(s.hour_ts AS TIMESTAMP) AS hour_ts,
       coalesce(h.n, 0) AS n_events,
       round(last_value(h.v IGNORE NULLS) OVER
             (PARTITION BY s.event_type ORDER BY s.hour_ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS v_filled
FROM spine s LEFT JOIN hourly h
  ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts
""",
        "streaming_static_join": """
SELECT c_mktsegment,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
        "streaming_foreachbatch": """
SELECT event_type,
       count(*) AS n_events,
       round(sum(round(value, 2)), 2) AS sum_value,
       min(event_id) AS min_event,
       max(event_id) AS max_event
FROM events WHERE value > 50.0
GROUP BY event_type
""",
        "scalar_try_functions": """
SELECT l_orderkey, l_linenumber,
       round(CASE WHEN l_discount = 0 THEN NULL
                  ELSE l_extendedprice / l_discount END, 4) AS price_per_discount,
       CAST(NULL AS DOUBLE) AS div_zero,
       TRY_CAST(l_returnflag AS INT) AS flag_as_int,
       TRY_CAST(CAST(l_orderkey AS VARCHAR) AS INT) AS key_roundtrip
FROM lineitem
""",
    }
