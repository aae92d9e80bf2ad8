"""Graded queries, part 3: temporal/non-equi joins, multi-level and
distinct/percentile aggregation, extended window functions, global
top-k, CSV/JSON source connectors, BPE-style tokenization, winnowing
fingerprints, IVF ANN, and the extra streaming surface (sessions +
custom stateful operator).

Same contract as queries_core/queries_ext: identical column aliases on
both engines, floats rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import dedup, joins, multimodal, similarity, text
from rdbms_subsetter_spark.queries_ext import _shingle_cte
from rdbms_subsetter_spark.sources import csv_roundtrip, json_roundtrip
from rdbms_subsetter_spark.streaming import events as streaming_events

# price bands for the range join: p_retailprice spans [900, 1000)
PRICE_BANDS = [(float(lo), float(lo + 10)) for lo in range(900, 1000, 10)]


# ---------------------------------------------------------------------------
# joins: as-of / range
# ---------------------------------------------------------------------------


def q_asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusive backward as-of: each event gets its user's most recent
    order at-or-before the event (ties broken by highest o_orderkey)."""
    cat = Catalog(spark, sf_dir)
    left = cat["events"].select("event_id", "user_id", "ts")
    return joins.asof_join(
        left,
        cat["orders"],
        on=[("user_id", "o_custkey")],
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )


def q_asof_join_prev_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict backward self-as-of: each event gets the user's previous
    event (true temporal interleaving within the key)."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("prev_event_id"),
        F.round(F.col("value"), 2).alias("prev_value"),
    )
    return joins.asof_join(
        left,
        right,
        on=[("user_id", "user_id")],
        left_ts="ts",
        right_ts="r_ts",
        payload=["prev_event_id", "prev_value"],
        tiebreak="prev_event_id",
        strict=True,
    )


def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: parts bucketed into $10 retail-price bands via
    a broadcast non-equi join, then aggregated per band."""
    cat = Catalog(spark, sf_dir)
    banded = joins.band_join(cat["part"], "p_retailprice", PRICE_BANDS)
    return banded.groupBy("band_lo").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# aggregation: rollup / distinct / percentiles; global top-k
# ---------------------------------------------------------------------------


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation: ROLLUP(segment, nation) with grouping id
    (CUBE/GROUPING SETS are the same Expand operator underneath)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["customer"]
        .rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping combinations."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse events.props JSON into
    map<string,string>, then map_keys / element_at / size.

    The key list is serialized to a CSV string at the query boundary:
    the driver's pandas canonicalizer sorts on every output column and
    list-valued cells are unhashable there (r01 grading failure).

    ``try_cast`` (not ``.cast``): props is untrusted JSON, and under
    Spark 4's default ANSI mode a non-numeric ``k`` value would throw
    CAST_INVALID_INPUT mid-scan; try_cast yields NULL — matching the
    oracle, which uses DuckDB TRY_CAST.  Identical wherever k is
    numeric (the fixed datasets)."""
    cat = Catalog(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,string>")
    return cat["events"].select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "k").try_cast("int").alias("k_val"),
    )


def q_agg_distinct_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates + exact interpolated percentiles per flag.

    Deliberately TWO aggregations joined on the tiny group key instead
    of one: mixing percentile() into the distinct-agg Expand makes Spark
    keep a percentile buffer per expanded (flag, distinct-value) row
    (measured 2.4M buffers at sf0.1, ~6 s); split, the distinct branch
    stays in codegen HashAggregate and percentile buffers exist only per
    flag (3 groups).  The join is a broadcast of a 3-row side.
    """
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"]
    distincts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_qty_distinct"),
    )
    pcts = li.groupBy("l_returnflag").agg(
        F.round(F.percentile(F.col("l_extendedprice"), F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile(F.col("l_extendedprice"), F.lit(0.9)), 4).alias("p90_price"),
    )
    return distincts.join(F.broadcast(pcts), on="l_returnflag")


def q_join_topk_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped composite: selective filters on all three tables
    (pushed to the parquet scans), 3-way join, agg, global top-10.
    The plan to want: filters in PushedFilters, customer broadcast,
    one shuffle for the lineitem⋈orders join, TakeOrdered final."""
    cat = Catalog(spark, sf_dir)
    cutoff = "1998-06-01"
    cust = cat["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = cat["orders"].filter(F.col("o_orderdate") < cutoff)
    li = cat["lineitem"].filter(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


STRATA_RATES = {"BUILDING": 50, "MACHINERY": 20, "AUTOMOBILE": 5}


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of customers (per-segment rates)."""
    from rdbms_subsetter_spark.sampling import sample_stratified_modulo

    cat = Catalog(spark, sf_dir)
    return sample_stratified_modulo(cat["customer"], "c_custkey", "c_mktsegment", STRATA_RATES)


def q_agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL++ distinct, KLL-style quantiles): the
    approximate counterparts of agg_distinct_percentile for when exact
    distinct/percentile state is too large at 100 TB.  Approximation is
    engine-specific → rows-only check; accuracy vs exact is asserted in
    tests/test_operators.py."""
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_n_supp"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_n_part"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.9, 10_000).alias("approx_p90_price"),
    )


def q_top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrdered: per-partition top-k, then a single
    driver-side merge of k-sized heads — never a full sort)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# windows: lag / lead / ntile / percent_rank / range frame
# ---------------------------------------------------------------------------


def q_window_lag_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return cat["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("spend_within_1000"),
    )


# ---------------------------------------------------------------------------
# sources: CSV / JSON round-trips
# ---------------------------------------------------------------------------


def q_csv_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV → read back (explicit schema) → aggregate; the
    oracle reads the original parquet, so any text-round-trip loss or
    schema drift breaks the hash."""
    cat = Catalog(spark, sf_dir)
    rt = csv_roundtrip(cat["customer"], tag=f"{sf_dir}/customer")
    return rt.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


def q_json_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events (timestamps included) → JSON lines → read back → aggregate."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select("event_id", "ts", "user_id", "event_type", "value")
    rt = json_roundtrip(ev, tag=f"{sf_dir}/events")
    return rt.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# text / fingerprints / ANN
# ---------------------------------------------------------------------------


def q_text_tokenize_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer counts vs whitespace tokens (fertility)."""
    cat = Catalog(spark, sf_dir)
    t = F.col("text")
    return cat["documents"].select(
        "doc_id",
        text.token_count(t).alias("n_ws_tokens"),
        text.bpe_token_count(t).alias("n_bpe_tokens"),
        F.round(text.bpe_token_count(t) / text.token_count(t), 6).alias("fertility"),
    )


def q_doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bottom_k is serialized to CSV at the query boundary (driver's
    canonicalizer cannot hash list cells)."""
    cat = Catalog(spark, sf_dir)
    fp = dedup.winnow_fingerprints(cat["documents"], n=3, k=4)
    return fp.withColumn(
        "bottom_k",
        F.array_join(F.transform("bottom_k", lambda x: x.cast("string")), ","),
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN (k-means cells, n_probe probing) — rows-only
    check (iterative k-means is not SQL-expressible); recall vs brute
    force is asserted in tests/test_operators.py."""
    cat = Catalog(spark, sf_dir)
    emb = cat["embeddings"]
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.ivf_topk(emb, queries, k=5, n_clusters="auto", n_probe=4)


def q_join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join: customer spend per nation including nations with
    no customers AND orphan customers (none in consistent data — the
    shape is what's graded)."""
    cat = Catalog(spark, sf_dir)
    spend = (
        cat["orders"]
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    return (
        cat["customer"]
        .join(spend, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend"),
            F.col("spend").isNull().alias("never_ordered"),
        )
    )


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: levenshtein / regexp_extract / translate / pads."""
    cat = Catalog(spark, sf_dir)
    name = F.col("p_name")
    return cat["part"].select(
        "p_partkey",
        F.levenshtein(name, F.col("p_brand")).alias("lev_to_brand"),
        F.regexp_extract(name, r"^(\w+)", 1).alias("first_word"),
        F.translate(F.col("p_brand"), "#", "_").alias("brand_clean"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse(F.col("p_type")).alias("type_rev"),
    )


def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry path: identical ANSI SQL runs on both
    engines (temp views registered from the catalog)."""
    cat = Catalog(spark, sf_dir)
    for t in ("orders", "customer"):
        cat[t].createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# sliding windows / pivot / array surface / multimodal depth
# ---------------------------------------------------------------------------


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding windows (1h window, 30min slide): each event
    lands in exactly two windows (Expand ×2, one shuffle)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of q_events_sliding; complete-mode
    bounded replay equals the batch sliding aggregate -> same oracle."""
    return streaming_events.streaming_sliding_counts(spark, sf_dir)


def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: revenue by returnflag × linestatus as columns."""
    cat = Catalog(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    piv = (
        cat["lineitem"]
        .withColumn("rev", rev)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("rev"), 2))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").alias("rev_f"),
        F.col("O").alias("rev_o"),
    )


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over embeddings (transform / aggregate /
    min / max / slice — all codegen, no UDF)."""
    from rdbms_subsetter_spark.operators.similarity import dot

    cat = Catalog(spark, sf_dir)
    e = F.col("embedding")
    return cat["embeddings"].select(
        "vec_id",
        F.size(e).alias("dim"),
        F.round(F.sqrt(dot(e, e)), 6).alias("l2_norm"),
        F.round(F.array_min(e).cast("double"), 6).alias("min_val"),
        F.round(F.array_max(e).cast("double"), 6).alias("max_val"),
        F.round(
            F.aggregate(e, F.lit(0.0), lambda a, x: a + x.cast("double")) / F.size(e), 6
        ).alias("mean_val"),
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass decode+resize geometry via mapInPandas."""
    cat = Catalog(spark, sf_dir)
    return multimodal.decode_and_resize(
        multimodal.media_from_documents(cat["documents"]), 224, 224
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (md5-derived stub embedding).

    The feature vector is serialized as micro-scaled-int CSV at the
    query boundary (values are rounded to 6 dp upstream, so ×1e6 is an
    exact integer in both engines; the driver canonicalizer cannot hash
    list cells)."""
    cat = Catalog(spark, sf_dir)
    feats = multimodal.extract_features(multimodal.media_from_documents(cat["documents"]))
    return feats.withColumn(
        "features",
        F.array_join(
            F.transform(
                "features",
                lambda x: F.round(x * 1_000_000).cast("bigint").cast("string"),
            ),
            ",",
        ),
    )


# ---------------------------------------------------------------------------
# UDF surface: grouped pandas + UDTF
# ---------------------------------------------------------------------------


def q_udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas (Arrow-batched) z-score per event type."""
    from rdbms_subsetter_spark.functions import grouped_zscore

    cat = Catalog(spark, sf_dir)
    ev = cat["events"].select("event_id", "event_type", "value")
    return grouped_zscore(ev, "event_type", "value").select(
        "event_id", "event_type", F.round(F.col("zscore"), 6).alias("zscore")
    )


def q_udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (lateral join) exploding documents into sentences."""
    from rdbms_subsetter_spark.functions import sentence_split_udtf

    cat = Catalog(spark, sf_dir)
    return sentence_split_udtf(cat["documents"])


# ---------------------------------------------------------------------------
# streaming: sessions + custom stateful operator
# ---------------------------------------------------------------------------


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows over the replayed stream; complete-mode
    bounded replay equals batch gap-sessionization (session_end = last
    event + gap), so it is hash-checked against the DuckDB oracle."""
    return streaming_events.streaming_session_counts(spark, sf_dir)


def q_streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running totals; after the bounded replay
    the final state per user equals the batch aggregate, so this
    streaming query IS DuckDB-checkable."""
    return streaming_events.streaming_stateful_totals(spark, sf_dir)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def ext2_queries() -> dict:
    return {
        "asof_join_latest_order": q_asof_join_latest_order,
        "asof_join_prev_event": q_asof_join_prev_event,
        "range_join_price_bands": q_range_join_price_bands,
        "agg_rollup": q_agg_rollup,
        "agg_cube": q_agg_cube,
        "map_functions": q_map_functions,
        "agg_distinct_percentile": q_agg_distinct_percentile,
        "join_topk_unshipped": q_join_topk_unshipped,
        "sample_stratified": q_sample_stratified,
        "agg_approx_sketches": q_agg_approx_sketches,
        "top_orders_global": q_top_orders_global,
        "window_lag_lead_ntile": q_window_lag_lead_ntile,
        "csv_source_agg": q_csv_source_agg,
        "json_source_agg": q_json_source_agg,
        "text_tokenize_bpe": q_text_tokenize_bpe,
        "doc_fingerprint_winnow": q_doc_fingerprint_winnow,
        "ann_ivf_topk": q_ann_ivf_topk,
        "join_outer_full": q_join_outer_full,
        "string_functions": q_string_functions,
        "sql_api": q_sql_api,
        "events_sliding": q_events_sliding,
        "streaming_sliding": q_streaming_sliding,
        "agg_pivot": q_agg_pivot,
        "array_functions": q_array_functions,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_features": q_multimodal_features,
        "udf_grouped_zscore": q_udf_grouped_zscore,
        "udtf_sentence_split": q_udtf_sentence_split,
        "streaming_sessions": q_streaming_sessions,
        "streaming_stateful_totals": q_streaming_stateful_totals,
    }


def _bands_values() -> str:
    return ", ".join(f"({lo}, {hi})" for lo, hi in PRICE_BANDS)


def ext2_oracles() -> dict:
    return {
        "asof_join_latest_order": """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM events e
  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rn = 1
""",
        "asof_join_prev_event": """
SELECT event_id, user_id, ts, prev_event_id, prev_value FROM (
  SELECT e.event_id, e.user_id, e.ts,
         p.event_id AS prev_event_id, round(p.value, 2) AS prev_value,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY p.ts DESC NULLS LAST,
                                     p.event_id DESC NULLS LAST) AS rn
  FROM events e
  LEFT JOIN events p ON e.user_id = p.user_id AND p.ts < e.ts
) WHERE rn = 1
""",
        "range_join_price_bands": f"""
WITH bands(lo, hi) AS (VALUES {_bands_values()})
SELECT CAST(lo AS DOUBLE) AS band_lo,
       count(*) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price,
       round(sum(p_retailprice), 2) AS sum_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY lo
""",
        "agg_rollup": """
SELECT c_mktsegment, c_nationkey,
       count(*) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal,
       CAST(grouping(c_mktsegment, c_nationkey) AS INT) AS gid
FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
""",
        "agg_cube": """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS gid
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
        "map_functions": """
SELECT event_id,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       array_to_string(list_sort(CAST(json_keys(props) AS VARCHAR[])), ',') AS keys_csv,
       TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_val
FROM events
""",
        "agg_distinct_percentile": """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       round(sum(DISTINCT l_quantity), 2) AS sum_qty_distinct,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem GROUP BY l_returnflag
""",
        "join_topk_unshipped": """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
        "sample_stratified": f"""
SELECT * FROM customer
WHERE c_custkey % 100 < (CASE c_mktsegment {" ".join(
    f"WHEN '{seg}' THEN {pct}" for seg, pct in sorted(STRATA_RATES.items())
)} ELSE 0 END)
""",
        "agg_approx_sketches": None,  # approximation is engine-specific
        "top_orders_global": """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
        "window_lag_lead_ntile": """
SELECT o_orderkey, o_custkey,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), 2) AS spend_within_1000
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
        "csv_source_agg": """
SELECT c_mktsegment,
       count(*) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal,
       min(c_custkey) AS min_key,
       max(c_custkey) AS max_key
FROM customer GROUP BY c_mktsegment
""",
        "json_source_agg": """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events GROUP BY event_type
""",
        "text_tokenize_bpe": r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       round(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) * 1.0
             / len(string_split_regex(trim(text), '\s+')), 6) AS fertility
FROM documents
""",
        "doc_fingerprint_winnow": f"""
WITH {_shingle_cte(3)},
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh)
SELECT doc_id,
       count(*) AS n_shingles,
       min(h) AS min_hash,
       array_to_string(list_slice(list_sort(list(h)), 1, 4), ',') AS bottom_k
FROM hashed GROUP BY doc_id
""",
        "ann_ivf_topk": None,  # iterative k-means: rows-only
        "join_outer_full": """
SELECT c_custkey, c_name,
       coalesce(s.spend, 0.0) AS spend,
       s.spend IS NULL AS never_ordered
FROM customer
FULL OUTER JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
                 FROM orders GROUP BY o_custkey) s
  ON c_custkey = s.o_custkey
""",
        "string_functions": r"""
SELECT p_partkey,
       CAST(levenshtein(p_name, p_brand) AS INT) AS lev_to_brand,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
       replace(p_brand, '#', '_') AS brand_clean,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       reverse(p_type) AS type_rev
FROM part
""",
        "sql_api": """
SELECT c_mktsegment,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_spend
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
GROUP BY c_mktsegment
""",
        "events_sliding": """
SELECT ws AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM (SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' * k AS ws,
             event_type, value
      FROM events, unnest([0, 1]) AS t(k))
GROUP BY ws, event_type
""",
        "streaming_sliding": """
SELECT ws AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM (SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' * k AS ws,
             event_type, value
      FROM events, unnest([0, 1]) AS t(k))
GROUP BY ws, event_type
""",
        "agg_pivot": """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_f,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_o
FROM lineitem GROUP BY l_returnflag
""",
        "array_functions": """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
       round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
       round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6) AS mean_val
FROM embeddings
""",
        "multimodal_resize": """
WITH d AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
         CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height
  FROM documents)
SELECT media_id, media_type, width, height,
       CAST(greatest(floor(width * least(224.0 / width, 224.0 / height, 1.0)), 1) AS INT) AS resized_w,
       CAST(greatest(floor(height * least(224.0 / width, 224.0 / height, 1.0)), 1) AS INT) AS resized_h
FROM d
""",
        "multimodal_features": f"""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       array_to_string([{", ".join(
           f"CAST(round(round(CAST(('0x' || substr(md5(text), {2 * j + 1}, 2)) AS INT) / 255.0, 6) * 1000000) AS BIGINT)"
           for j in range(8)
       )}], ',') AS features
FROM documents
""",
        "udf_grouped_zscore": """
SELECT event_id, event_type,
       round((value - avg(value) OVER w) / stddev_pop(value) OVER w, 6) AS zscore
FROM events
WINDOW w AS (PARTITION BY event_type)
""",
        "udtf_sentence_split": """
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, '.'),
                                    x -> trim(x, ' ' || chr(9) || chr(10) || chr(13))),
                     x -> x <> '') AS l
  FROM documents)
SELECT doc_id,
       CAST(i AS INT) AS sentence_idx,
       l[CAST(i AS INT)] AS sentence
FROM s, unnest(range(1, len(l) + 1)) AS t(i)
""",
        "streaming_sessions": """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id, count(*) AS n_events
FROM sessions GROUP BY user_id, sid
""",
        "streaming_stateful_totals": """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY user_id
""",
    }
