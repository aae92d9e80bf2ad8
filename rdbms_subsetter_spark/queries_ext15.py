"""Round-6 battery growth (SURVEY §7b backlog): QUALIFY-style top-k,
int8-quantization recall audit, sketch-based join-cardinality audit,
append-mode streaming sessions, and the IVM retraction path.

Registered LAST per the grading discipline — all 223 prior entries hold
driver verdicts, so these grade first in the round-6 window without
displacing anything.

Reference anchor: none of these exist in 18F/rdbms-subsetter (SURVEY §2A
"Not implemented by the reference"); they are BASELINE.json extension
surface (LLM-data-pipeline + SQL-surface completeness).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog


# ---------------------------------------------------------------------------
# SQL QUALIFY-style per-group top-k
# ---------------------------------------------------------------------------


def q_sql_qualify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-style per-group top-k — the user-facing SQL surface for
    "filter on a window function without a subquery".

    OSS Spark 4.1.2 does NOT parse the ``QUALIFY`` clause (verified:
    ``PARSE_SYNTAX_ERROR`` at the keyword), so the Spark side runs the
    exact query QUALIFY desugars to — a window + predicate that the
    optimizer rewrites into ``WindowGroupLimit`` (per-partition top-k
    maintained BEFORE the shuffle-side sort, the same physical plan an
    engine with native QUALIFY produces; plan-asserted in
    tests/test_scale_plans.py).  The DuckDB oracle uses the literal
    QUALIFY syntax, so the entry grades the semantic contract of the
    clause across engines.

    Scale shape: WindowGroupLimit keeps ≤ k rows per group per map
    task, so the window sort never sees more than groups × k rows."""
    from rdbms_subsetter_spark.queries_ext14 import _scoped_view

    cat = Catalog(spark, sf_dir)
    view = _scoped_view(spark, cat["orders"], "qualify_orders", sf_dir)
    try:
        return spark.sql(
            f"""
            SELECT o_orderpriority, o_orderkey, o_totalprice, rn
            FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey) AS rn
              FROM {view})
            WHERE rn <= 3
            """
        )
    finally:
        spark.catalog.dropTempView(view)


_SQL_QUALIFY_TOPK = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC,
                                        o_orderkey) AS INT) AS rn
FROM orders
QUALIFY rn <= 3
"""


# ---------------------------------------------------------------------------
# Int8-quantization recall audit
# ---------------------------------------------------------------------------


def _dequantized(emb: DataFrame) -> DataFrame:
    """The int8 round-trip a vector store actually serves from:
    x̂ᵢ = mn + round((xᵢ − mn)/scale)·scale with scale = (mx − mn)/255
    (same per-vector affine scheme as ``operators.similarity
    .quantize_int8``, applied at full precision so the oracle can
    reproduce it bit-exactly).  Staged projections compute the cast
    array and min/max once each — codegen does not CSE higher-order
    lambdas."""
    dm = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    s = emb.select("vec_id", dm.alias("__dm")).select(
        "vec_id",
        "__dm",
        F.array_min("__dm").alias("__mn"),
        F.array_max("__dm").alias("__mx"),
    )
    mn, mx = F.col("__mn"), F.col("__mx")
    scale = (mx - mn) / F.lit(255.0)
    return s.select(
        "vec_id",
        F.when(mx == mn, F.transform("__dm", lambda x: mn))
        .otherwise(
            F.transform("__dm", lambda x: mn + F.round((x - mn) / scale) * scale)
        )
        .alias("embedding"),
    )


#: embed_quant_recall's audited-sample id window: one constant,
#: interpolated into BOTH the operator filter and the DuckDB oracle
#: (ADVICE r08 — as independent literals, a drift between the two
#: would pass every graded SF silently, since the cap is inert below
#: vec_id 10^6, and only diverge at stress scale).
QUANT_RECALL_ID_CAP = 1_000_000


def q_embed_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization recall audit: does int8 storage actually preserve
    retrieval?  For each query vector the float32 exact cosine top-10
    is compared with the top-10 computed over the int8-dequantized
    corpus; the audit emits the per-query overlap and a boolean
    ``recall_ok = overlap ≥ 7`` that the oracle asserts — turning
    ``embed_quantize_int8`` from "runs" into "provably still finds the
    same neighbors" (measured overlap ≥ 9/10 on every SF; the 7/10 gate
    catches any real quantization regression, which craters overlap).

    Both paths ride the bounded-broadcast ``cosine_topk`` kernel
    (query side guarded, corpus scan emits local top-k only); ranking
    is on the 6-decimal-rounded cosine with neighbor-id tiebreak, so
    the DuckDB oracle reproduces both top-k sets exactly.

    The audited query set is a FIXED-SIZE deterministic sample
    (``vec_id % 10 == 0 AND vec_id < 10^6``), not a corpus fraction:
    recall is a statistic, and a sample that grew with the corpus
    would make the audit O(n²) — the ×64 embeddings rung measured the
    unbounded form at 388 s (260×) vs linear with the cap (SCALE.md
    round 8).  The id window is inert at every graded SF (max vec_id
    4,999), so gate outputs are bit-identical; at stress/production
    scales only the capped sample is audited, exactly as a 100 TB
    recall audit would sample."""
    from rdbms_subsetter_spark.operators import similarity

    cat = Catalog(spark, sf_dir)
    emb = cat["embeddings"]
    dq = _dequantized(emb)
    sample = (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < QUANT_RECALL_ID_CAP)
    fq = emb.filter(sample)
    iq = dq.filter(sample)
    fk = similarity.cosine_topk(emb, fq, k=10).select("query_id", "neighbor_id")
    ik = similarity.cosine_topk(dq, iq, k=10).select(
        F.col("query_id").alias("__q"), F.col("neighbor_id").alias("__n")
    )
    return (
        fk.join(
            ik,
            (fk["query_id"] == ik["__q"]) & (fk["neighbor_id"] == ik["__n"]),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("__n").isNotNull(), 1).otherwise(0))
            .cast("int")
            .alias("n_overlap")
        )
        .select(
            "query_id",
            "n_overlap",
            (F.col("n_overlap") >= 7).alias("recall_ok"),
        )
    )


_SQL_QUANT_RECALL = f"""
WITH m AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_min(CAST(embedding AS DOUBLE[])) AS mn,
         list_max(CAST(embedding AS DOUBLE[])) AS mx
  FROM embeddings),
dq AS (
  SELECT vec_id,
         CASE WHEN mx = mn THEN list_transform(e, x -> mn)
              ELSE list_transform(e, x -> mn + round((x - mn) / ((mx - mn) / 255.0))
                                              * ((mx - mn) / 255.0))
         END AS e
  FROM m),
fknn AS (
  SELECT qid, nid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS nid,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_dot_product(a.e, b.e)
                            / (sqrt(list_dot_product(a.e, a.e))
                               * sqrt(list_dot_product(b.e, b.e))), 6) DESC,
                      b.vec_id) AS rk
    FROM m a JOIN m b ON a.vec_id <> b.vec_id
    WHERE a.vec_id % 10 = 0 AND a.vec_id < {QUANT_RECALL_ID_CAP})
  WHERE rk <= 10),
iknn AS (
  SELECT qid, nid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS nid,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_dot_product(a.e, b.e)
                            / (sqrt(list_dot_product(a.e, a.e))
                               * sqrt(list_dot_product(b.e, b.e))), 6) DESC,
                      b.vec_id) AS rk
    FROM dq a JOIN dq b ON a.vec_id <> b.vec_id
    WHERE a.vec_id % 10 = 0 AND a.vec_id < {QUANT_RECALL_ID_CAP})
  WHERE rk <= 10)
SELECT f.qid AS query_id,
       CAST(sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_overlap,
       sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) >= 7 AS recall_ok
FROM fknn f LEFT JOIN iknn i ON f.qid = i.qid AND f.nid = i.nid
GROUP BY f.qid
"""


# ---------------------------------------------------------------------------
# Sketch-based join-cardinality audit
# ---------------------------------------------------------------------------


def q_join_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from sketches, audited against the exact
    count — the optimizer-statistics primitive for planning a 100 TB
    fact-to-fact join WITHOUT running it: three HLL++ sketches (build
    keys, probe keys, union) give the matched-key count by
    inclusion-exclusion (|A∩B| = |A|+|B|−|A∪B|), and the System-R
    uniformity estimate ``rows × matched/distinct`` predicts the join
    output size.  Each sketch is one map-side-combinable aggregate over
    its own scan — nothing is joined to estimate the join.

    Graded like ``agg_sketch_error_bounds``: Spark computes sketch AND
    exact and emits booleans for the error contracts (HLL build count
    within 5%, inclusion-exclusion matched count within 10%, row
    estimate within 20% — measured 0.4%/1.0%/6.7% worst across SFs, so
    the bounds carry ≥3× margin while still failing on any real sketch
    regression); the oracle recomputes the exact values and asserts the
    booleans TRUE.  The exact side exists only to audit the sketch and
    runs at gate scale — at 100 TB only the sketches run (that is the
    point: the estimate costs two scans, the join itself would cost a
    full shuffle)."""
    cat = Catalog(spark, sf_dir)
    o = (
        cat["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
    )
    li = cat["lineitem"].select(F.col("l_orderkey").alias("k"))

    # exact audit side: per-key probe counts joined to the build keys
    # (broadcast — build is the selective side), ONE shuffle on k
    likc = li.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    exact_join = likc.join(F.broadcast(o), "k").agg(
        F.sum("n").cast("long").alias("n_join_exact"),
        F.count(F.lit(1)).cast("long").alias("n_matched_keys"),
    )
    build = o.agg(
        F.count(F.lit(1)).cast("long").alias("d_build"),
        F.approx_count_distinct("k", rsd=0.01).alias("__db_h"),
    )
    probe = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_rows"),
        F.approx_count_distinct("k", rsd=0.01).alias("__dp_h"),
    )
    both = o.unionByName(li).agg(
        F.approx_count_distinct("k", rsd=0.01).alias("__du_h")
    )
    g = exact_join.crossJoin(build).crossJoin(probe).crossJoin(both)
    matched_h = F.col("__db_h") + F.col("__dp_h") - F.col("__du_h")
    est_rows = F.col("n_probe_rows") * matched_h / F.col("__dp_h")
    return g.select(
        "n_join_exact",
        "n_probe_rows",
        "d_build",
        "n_matched_keys",
        (
            F.abs(F.col("__db_h") - F.col("d_build"))
            <= F.greatest(F.lit(5.0), F.lit(0.05) * F.col("d_build"))
        ).alias("hll_build_ok"),
        (
            F.abs(matched_h - F.col("n_matched_keys"))
            <= F.greatest(F.lit(10.0), F.lit(0.10) * F.col("n_matched_keys"))
        ).alias("hll_matched_ok"),
        (
            F.abs(est_rows - F.col("n_join_exact"))
            <= F.lit(0.20) * F.col("n_join_exact")
        ).alias("est_rows_ok"),
    )


_SQL_JOIN_CARD_SKETCH = """
WITH b AS (SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
j AS (
  SELECT CAST(count(*) AS BIGINT) AS n_join_exact,
         CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_matched_keys
  FROM lineitem l JOIN b ON l.l_orderkey = b.k)
SELECT j.n_join_exact,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_probe_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS d_build,
       j.n_matched_keys,
       TRUE AS hll_build_ok, TRUE AS hll_matched_ok, TRUE AS est_rows_ok
FROM j
"""


# ---------------------------------------------------------------------------
# Append-mode streaming sessions (watermark-determinate region)
# ---------------------------------------------------------------------------


def q_streaming_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See streaming.events.streaming_session_append: append-mode
    session windows emit each session exactly once when the watermark
    passes its end; the result is cut to the provably-complete region
    (session_end < floor-to-second(final watermark)) so the finalized
    set equals the batch gaps-and-islands oracle under the same cut."""
    from rdbms_subsetter_spark.streaming.events import streaming_session_append

    return streaming_session_append(spark, sf_dir)


_SQL_STREAMING_SESSION_APPEND = """
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
HAVING max(ts) + INTERVAL 30 MINUTE <
       (SELECT date_trunc('second', max(ts)) - INTERVAL 1 HOUR FROM events)
"""


# ---------------------------------------------------------------------------
# Incremental view maintenance: the retraction (delete) path
# ---------------------------------------------------------------------------


def q_incr_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM with RETRACTIONS: ``incr_agg_maintenance`` proved base ⊕
    insert-delta ≡ recompute; this entry adds the delete half of a CDC
    changelog.  The frozen pre-watermark aggregate is maintained with
    BOTH an insert delta (rows after the watermark) and a retraction
    delta (upstream deleted every pre-watermark 'error' row), merged
    algebraically: counts and integer-cent sums form a commutative
    GROUP with subtraction, so deletes are just negated partials —
    ⊖ is ⊕ of (−n, −cents) — and groups whose maintained count reaches
    zero drop out of the view.  No history re-scan anywhere; at 100 TB
    the base is a stored-aggregate read and each refresh scans only the
    two delta partitions.

    The oracle recomputes the view from scratch over the post-delete
    row set (everything except pre-watermark errors), so the hash gate
    proves base ⊕ inserts ⊖ deletes ≡ full recompute — the IVM
    correctness condition for retractable aggregates."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    wm_max = ev.agg(F.max("ts")).collect()[0][0]
    wm = (wm_max or _dt.datetime(1970, 1, 1)) - _dt.timedelta(days=7)
    cents = F.round(F.col("value") * 100).cast("long")

    def partials(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("event_type").agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("n"),
            (F.lit(sign) * F.sum(cents)).alias("sum_cents"),
        )

    base_rows = ev.where(F.col("ts") <= F.lit(wm))
    base = partials(base_rows, +1)  # the frozen materialized aggregate
    inserts = partials(ev.where(F.col("ts") > F.lit(wm)), +1)
    deletes = partials(base_rows.where(F.col("event_type") == "error"), -1)
    merged = (
        base.unionByName(inserts)
        .unionByName(deletes)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("sum_cents").alias("sum_cents"))
        .where(F.col("n_events") > 0)
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_cents") / 100.0, 2).alias("total_value"),
    )


_SQL_INCR_AGG_RETRACT = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS total_value
FROM events
WHERE NOT (event_type = 'error'
           AND ts <= (SELECT max(ts) - INTERVAL 7 DAY FROM events))
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def ext15_queries() -> dict:
    return {
        "sql_qualify_topk": q_sql_qualify_topk,
        "embed_quant_recall": q_embed_quant_recall,
        "join_cardinality_sketch": q_join_cardinality_sketch,
        "streaming_session_append": q_streaming_session_append,
        "incr_agg_retract": q_incr_agg_retract,
    }


def ext15_oracles() -> dict:
    return {
        "sql_qualify_topk": _SQL_QUALIFY_TOPK,
        "embed_quant_recall": _SQL_QUANT_RECALL,
        "join_cardinality_sketch": _SQL_JOIN_CARD_SKETCH,
        "streaming_session_append": _SQL_STREAMING_SESSION_APPEND,
        "incr_agg_retract": _SQL_INCR_AGG_RETRACT,
    }
