"""Round-7 battery growth (≤5 per the grading discipline, registered
LAST): cross-corpus minhash decontamination, the Spark 4 approx_top_k
sketch, an event-time-TTL stateful streaming operator, and the twins
that kept the pre-flip semantics graded after the round-7
scale-configuration flips (the minlabel CC engine remains; the
uncapped-jaccard twin was retired in round 8 — note below).

Reference anchor: none of these exist in 18F/rdbms-subsetter (SURVEY
§2A "Not implemented by the reference"); they are BASELINE.json
extension surface (LLM-data-pipeline + sketch + streaming-state
completeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import dedup
from rdbms_subsetter_spark.queries_ext import (
    _TOKS,
    _capped_shingle_cte,
    _minhash_oracle,
    _shingle_cte,
    NGRAM_MAX_DOC_FREQ,
)


# ---------------------------------------------------------------------------
# cross-corpus (train vs eval) minhash decontamination
# ---------------------------------------------------------------------------


def q_dedup_minhash_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-level train-vs-eval contamination: LSH candidates
    across the doc_id % 10 split, verified with true n-gram Jaccard —
    the fuzzy-duplicate complement of ``decontaminate_ngram``'s exact
    5-gram hits (see dedup.minhash_cross_corpus_pairs)."""
    cat = Catalog(spark, sf_dir)
    return dedup.minhash_cross_corpus_pairs(
        cat["documents"], eval_mod=10, num_hashes=16, bands=4, threshold=0.5
    )


# ---------------------------------------------------------------------------
# approx_top_k: the Spark 4 space-saving sketch, graded deterministically
# ---------------------------------------------------------------------------


_TOPK_K = 20
_TOPK_CAPACITY = 1_000_000


def q_agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy-hitter tokens via Spark 4's ``approx_top_k``
    aggregate (space-saving sketch) — the sketch twin of the exact
    ``heavy_hitters_tokens``.

    Two determinism locks make a sketch hash-gradable against an exact
    SQL oracle:

    * ``maxItemsTracked`` (1M) exceeds the token vocabulary, so the
      space-saving counts are EXACT, not estimates;
    * the sketch's k-boundary tie order is arbitrary, so the result is
      cut to items whose count STRICTLY exceeds the k-th count (the
      boundary value itself is tie-order-independent: it is the k-th
      element of the sorted count multiset).  Groups returning fewer
      than k items keep everything (boundary −1).

    At 100 TB the capacity cap makes this the production form: state is
    O(maxItemsTracked) per group regardless of corpus size, merged
    map-side — where the exact groupBy's shuffle carries every distinct
    token.  (Counts then become ±ε estimates; the strict-boundary cut
    stays the right way to consume them.)"""
    from rdbms_subsetter_spark.operators.text import normalize, tokens

    cat = Catalog(spark, sf_dir)
    toks = cat["documents"].select(
        "lang", F.explode(tokens(normalize(F.col("text")))).alias("tok")
    )
    sk = toks.groupBy("lang").agg(
        F.expr(f"approx_top_k(tok, {_TOPK_K}, {_TOPK_CAPACITY})").alias("tk")
    )
    ex = sk.select("lang", F.explode("tk").alias("e")).select(
        "lang",
        F.col("e.item").alias("token"),
        F.col("e.count").cast("long").alias("freq"),
    )
    w = Window.partitionBy("lang")
    return (
        ex.withColumn("n_returned", F.count(F.lit(1)).over(w))
        .withColumn(
            "boundary",
            F.when(F.col("n_returned") >= _TOPK_K, F.min("freq").over(w)).otherwise(
                F.lit(-1)
            ),
        )
        .filter(F.col("freq") > F.col("boundary"))
        .select("lang", "token", "freq")
    )


_SQL_APPROX_TOP_K = f"""
WITH toks AS (SELECT lang, unnest({_TOKS}) AS token FROM documents),
counts AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS freq
  FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT lang, token, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, token) AS rn
  FROM counts),
bnd AS (
  SELECT lang, max(CASE WHEN rn = {_TOPK_K} THEN freq END) AS kth
  FROM ranked GROUP BY lang)
SELECT c.lang, c.token, c.freq
FROM counts c JOIN bnd USING (lang)
WHERE c.freq > coalesce(bnd.kth, -1)
"""


# ---------------------------------------------------------------------------
# event-time-TTL stateful streaming (grouped applyInPandasWithState)
# ---------------------------------------------------------------------------


def q_streaming_ttl_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See streaming.events.streaming_ttl_activity: per-user trailing
    7-day event-type activity with event-time-TTL-evicted list state —
    deterministic under any replay batching because eviction can never
    drop an entry the final trailing window needs (the user's max only
    grows) and each user's last emission is anchored to his own final
    max.  Oracle: events within 7 days of the per-user max(ts)."""
    from rdbms_subsetter_spark.streaming.events import streaming_ttl_activity

    return streaming_ttl_activity(spark, sf_dir, ttl_days=7)


_SQL_STREAMING_TTL_ACTIVITY = """
WITH u AS (SELECT user_id, max(epoch_us(ts)) AS umax FROM events GROUP BY user_id)
SELECT e.user_id, e.event_type,
       CAST(count(*) AS BIGINT) AS n_recent,
       u.umax AS user_last_us
FROM events e JOIN u USING (user_id)
WHERE epoch_us(e.ts) >= u.umax - 604800000000
GROUP BY e.user_id, e.event_type, u.umax
"""


# ---------------------------------------------------------------------------
# pre-flip semantics twins (round-7 grading continuity)
# ---------------------------------------------------------------------------


# ``dedup_ngram_jaccard_uncapped`` was RETIRED in round 8 (it lived at
# this spot through rounds 7): it existed solely as grading continuity
# for the round-7 capped flip, and once `dedup_ngram_jaccard` (capped)
# held its own green r07 verdict the twin's only remaining property was
# its by-design Σdf² candidate fan — the one battery entry with a
# measured superlinear ratio (15.5× at ×8).  Prefix filtering was
# re-measured and is only a constant-factor cut on this corpus (the
# candidate volume is still Σ(prefix-df)², quadratic in df), so
# retirement is the only option meeting "no battery entry superlinear
# at its graded knobs".  The uncapped SEMANTICS remain fully available
# (`ngram_jaccard_pairs(..., max_doc_freq=None)`), fuzz-covered by
# tests/test_round7_property.py + test_round8_property.py, and
# scale-measured as the labelled control row in SCALE.md.


def q_dedup_cc_clusters_minlabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The min-label-propagation CC engine over the same capped pair
    graph as the (now star-contraction) graded ``dedup_cc_clusters`` —
    both engines stay graded against the identical recursive-CTE
    transitive-closure oracle, making their property-tested equivalence
    (tests/test_round6_property.py) driver-visible."""
    cat = Catalog(spark, sf_dir)
    edges = dedup.ngram_jaccard_pairs(
        cat["documents"], n=3, threshold=0.5, max_doc_freq=NGRAM_MAX_DOC_FREQ
    )
    return dedup.connected_components(edges, algorithm="minlabel").withColumnRenamed(
        "node", "doc_id"
    )


_SQL_CC_MINLABEL = f"""
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
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def ext16_queries() -> dict:
    return {
        "dedup_minhash_cross_corpus": q_dedup_minhash_cross_corpus,
        "agg_approx_top_k": q_agg_approx_top_k,
        "streaming_ttl_activity": q_streaming_ttl_activity,
        "dedup_cc_clusters_minlabel": q_dedup_cc_clusters_minlabel,
    }


def ext16_oracles() -> dict:
    return {
        "dedup_minhash_cross_corpus": _minhash_oracle(
            16, 4, 0.5, cross_corpus_mod=10
        ),
        "agg_approx_top_k": _SQL_APPROX_TOP_K,
        "streaming_ttl_activity": _SQL_STREAMING_TTL_ACTIVITY,
        "dedup_cc_clusters_minlabel": _SQL_CC_MINLABEL,
    }
