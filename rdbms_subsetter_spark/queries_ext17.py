"""Round-8 battery growth (≤5 per the grading discipline, registered
LAST): exact substring dedup via distributed suffix ranking, and the
skew-proof salted running total graded on a derived 97%-hot key (the
round-6 skew study showed plain top-k windows are WindowGroupLimit-
immune — this grades the salted path on the shape where salting
actually matters).

Reference anchor: none of these exist in 18F/rdbms-subsetter (SURVEY
§2A "Not implemented by the reference"); they are BASELINE.json
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import dedup
from rdbms_subsetter_spark.queries_ext import _TOKS


# ---------------------------------------------------------------------------
# exact substring dedup (suffix-ranking candidates + exact-LCS verify)
# ---------------------------------------------------------------------------

_SUBSTR_MIN_LEN = 8
#: Skew valve pinned on the GRADED entry (round 9): candidate volume is
#: Σ_cls C(df,2) and a boilerplate-heavy corpus (every doc sharing one
#: ≥8-token footer) goes quadratic in that class without a cap — the
#: same failure pattern the minhash family burned down over three
#: rounds.  16 matches the jaccard family's max_doc_freq and is inert
#: on the graded corpus (hottest class df=3, outputs identical); one
#: constant, interpolated into BOTH the operator call and the oracle.
_SUBSTR_MAX_RUN_FREQ = 16


def q_dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See operators.dedup.substring_dedup_pairs: exact longest common
    token-run per doc pair, pairs with lcs_len ≥ 8, restricted to pairs
    sharing at least one NON-boilerplate 8-token run (run classes in
    more than ``_SUBSTR_MAX_RUN_FREQ`` docs are dropped before pairing;
    CI tripwire in tests/test_scale_ratios.py).  Spark computes it with
    O(tokens·log min_len) prefix-doubling suffix classes + an
    Arrow-batched exact verify; the oracle brute-forces every k-gram
    (O(Σ len²) — fine at sf0.01, the shape the Spark path exists to
    avoid) and applies the identical df cap on the 8-gram classes."""
    cat = Catalog(spark, sf_dir)
    return dedup.substring_dedup_pairs(
        cat["documents"],
        min_len=_SUBSTR_MIN_LEN,
        max_run_freq=_SUBSTR_MAX_RUN_FREQ,
    )


_SQL_SUBSTRING_EXACT = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
dl AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= {_SUBSTR_MIN_LEN}),
positions AS (
  SELECT doc_id, t, n, unnest(generate_series(1, n - {_SUBSTR_MIN_LEN} + 1)) AS pos
  FROM dl),
pk AS (
  SELECT doc_id, t, pos, unnest(generate_series({_SUBSTR_MIN_LEN}, n - pos + 1)) AS k
  FROM positions),
grams AS (
  SELECT DISTINCT doc_id, k, md5(array_to_string(t[pos:pos+k-1], ' ')) AS g
  FROM pk),
g8 AS (SELECT DISTINCT doc_id, g FROM grams WHERE k = {_SUBSTR_MIN_LEN}),
cold8 AS (
  SELECT g FROM (SELECT g, count(*) AS df FROM g8 GROUP BY g)
  WHERE df <= {_SUBSTR_MAX_RUN_FREQ}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM g8 a JOIN g8 b ON a.g = b.g AND a.doc_id < b.doc_id
  JOIN cold8 c ON c.g = a.g)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST(max(a.k) AS BIGINT) AS lcs_len
FROM grams a JOIN grams b ON a.g = b.g AND a.k = b.k AND a.doc_id < b.doc_id
JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# salted running total over a 97%-hot key
# ---------------------------------------------------------------------------


def _hot_key():
    """Deterministic derived skew: ~29/30 of the user ids collapse into
    one 'hot' group (≈97% of event rows), the rest keep per-user keys —
    the adversarial shape for a running aggregate, where one key's rows
    would otherwise serialize through a single window task."""
    return F.when(
        F.col("user_id") % 30 == 0,
        F.concat(F.lit("u"), F.col("user_id").cast("string")),
    ).otherwise(F.lit("hot"))


def q_window_salted_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See partitioning.salted_running_total: range-bucket (by day) two-
    phase distributed prefix sum, result-identical to the plain running
    window (property-asserted in tests/test_round8_property.py).  Money
    as exact cents (BIGINT) — the established ULP-proof oracle form."""
    from rdbms_subsetter_spark.partitioning import salted_running_total

    events = Catalog(spark, sf_dir)["events"]
    base = events.select(
        "event_id",
        "ts",
        _hot_key().alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = salted_running_total(
        base,
        key_cols=["grp"],
        order_cols=["ts", "event_id"],
        value_col="cents",
        bucket=F.date_trunc("day", F.col("ts")),
        out_col="running_cents",
    )
    return out.select("event_id", "grp", "cents", "running_cents")


_SQL_SALTED_RUNNING_TOTAL = """
WITH e AS (
  SELECT event_id, ts,
         CASE WHEN user_id % 30 = 0 THEN 'u' || CAST(user_id AS VARCHAR)
              ELSE 'hot' END AS grp,
         CAST(ROUND(100 * value) AS BIGINT) AS cents
  FROM events)
SELECT event_id, grp, cents,
       CAST(SUM(cents) OVER (PARTITION BY grp ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM e
"""


# ---------------------------------------------------------------------------
# end-to-end dedup keep set (LSH pairs → components → representative)
# ---------------------------------------------------------------------------


def q_dedup_minhash_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production OUTPUT of the dedup family: which documents
    survive.  Chains the graded stages end-to-end — minhash-LSH
    candidate pairs (16 independent salted-md5 hashes, 4 bands, true-
    Jaccard verify at θ=0.5) → star-contraction connected components →
    keep the min-doc_id representative per cluster — and emits one row
    per corpus document with its cluster id, cluster size, and kept
    flag (singletons are their own kept cluster of 1).

    Every stage carries its own scale contract (linear candidate
    volume, O(log² n) contraction rounds); composing them adds only the
    final left join back to the corpus, shuffled on doc_id.  The oracle
    mirrors the full chain: the signature/band/verify SQL of
    dedup_minhash_lsh feeding a recursive-CTE transitive closure."""
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"]
    edges = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.5)
    cc = dedup.connected_components(edges, algorithm="star").withColumnRenamed(
        "node", "doc_id"
    )
    out = docs.select("doc_id").join(cc, "doc_id", "left")
    rep = F.coalesce("cluster_id", F.col("doc_id"))
    return out.select(
        "doc_id",
        rep.alias("cluster_id"),
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("n_members"),
        (rep == F.col("doc_id")).alias("kept"),
    )


def _minhash_keep_oracle(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    """Recursive-CTE closure over the dedup_minhash_lsh pair relation
    (the pair SQL is embedded verbatim via queries_ext._minhash_oracle
    so the two oracles can never drift apart)."""
    from rdbms_subsetter_spark.queries_ext import _minhash_oracle

    pairs_sql = _minhash_oracle(num_hashes, bands, threshold).strip()
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
sym AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
        UNION SELECT doc_id_2, doc_id_1 FROM pairs),
walk(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, w.label FROM sym s JOIN walk w ON s.dst = w.node),
lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node),
sized AS (
  SELECT doc_id, cluster_id,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM lab)
SELECT d.doc_id,
       coalesce(s.cluster_id, d.doc_id) AS cluster_id,
       CAST(coalesce(s.n_members, 1) AS BIGINT) AS n_members,
       coalesce(s.cluster_id, d.doc_id) = d.doc_id AS kept
FROM documents d LEFT JOIN sized s ON d.doc_id = s.doc_id
"""


# ---------------------------------------------------------------------------
# re-mergeable HLL sketch rollup (partials merged ≡ direct, within bound)
# ---------------------------------------------------------------------------


def q_agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB hypertable rollup pattern: per-(type, day) Datasketches
    HLL partials (``hll_sketch_agg``, lgK=12 ⇒ rsd ≈ 1.6%) stored once,
    then MERGED upward (``hll_union_agg``) without rescanning raw rows —
    re-mergeable sketch state is what lets a rollup hierarchy answer
    distinct-count questions at any resolution from fixed-size state.

    Graded like agg_sketch_error_bounds: exact answers where both
    engines can compute them (exact distinct users, partial count), and
    error-contract booleans for the sketch estimates — merged-partials
    estimate AND direct single-pass estimate both within 10% (±1) of
    exact, so a regression in the sketch or its merge path breaks the
    hash.  At lgK=12 the estimates are deterministic per input and
    measured within 2% at every SF; only the sketch columns survive at
    scale — exactness here exists to audit them."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    lgk = 12
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(F.hll_sketch_agg("user_id", F.lit(lgk)).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("est_merged"),
        F.count(F.lit(1)).alias("n_days"),
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(lgk))).alias(
            "est_direct"
        ),
        F.countDistinct("user_id").alias("n_exact"),
    )
    g = direct.join(F.broadcast(merged), on="event_type")
    tol = F.greatest(F.lit(1.0), F.lit(0.10) * F.col("n_exact"))
    return g.select(
        "event_type",
        "n_exact",
        "n_days",
        (F.abs(F.col("est_merged") - F.col("n_exact")) <= tol).alias("merged_ok"),
        (F.abs(F.col("est_direct") - F.col("n_exact")) <= tol).alias("direct_ok"),
    )


_SQL_HLL_ROLLUP = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
       TRUE AS merged_ok, TRUE AS direct_ok
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# OLS regression aggregates (regr_* family)
# ---------------------------------------------------------------------------


def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate surface (``regr_slope`` /
    ``regr_intercept`` / ``regr_r2`` / ``regr_count`` / ``regr_avgx`` /
    ``regr_avgy``): one-pass distributed OLS of extended price on
    quantity per return flag — moment sketches (n, Σx, Σy, Σxx, Σxy)
    merge associatively through the shuffle, so the fit costs exactly
    one map-side-combined aggregation at any scale.  ALL columns
    rounded to 4 decimals for cross-engine double parity (the
    agg_stats_moments precedent; r2 was briefly 6 decimals, tightened
    per ADVICE r08 — a last-digit double-accumulation difference
    between engines could flip the 6th decimal at some SF)."""
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"]
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n_pts"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 4).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_qty"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_price"),
    )


_SQL_REGRESSION = """
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pts,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
       round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
       round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def ext17_queries() -> dict:
    return {
        "dedup_substring_exact": q_dedup_substring_exact,
        "window_salted_running_total": q_window_salted_running_total,
        "dedup_minhash_keep": q_dedup_minhash_keep,
        "agg_hll_rollup": q_agg_hll_rollup,
        "agg_regression": q_agg_regression,
    }


def ext17_oracles() -> dict:
    return {
        "dedup_substring_exact": _SQL_SUBSTRING_EXACT,
        "window_salted_running_total": _SQL_SALTED_RUNNING_TOTAL,
        "dedup_minhash_keep": _minhash_keep_oracle(16, 4, 0.5),
        "agg_hll_rollup": _SQL_HLL_ROLLUP,
        "agg_regression": _SQL_REGRESSION,
    }
