"""Round-9 battery growth (≤5 per the grading discipline, registered
LAST): corpus-scale recall-audit twins for the two remaining rows-only
ANN entries (VERDICT r08 "What's missing" #3 / builder candidate #5).

``ann_srp_bucketed`` and ``ann_ivf_topk`` return engine-specific
approximate neighbor lists, so they grade rows-only; their fixture
twins prove exactness on literals but say nothing about retrieval
quality at corpus SF.  These twins close that gap with the
``embed_quant_recall`` / ``agg_sketch_error_bounds`` pattern: Spark
runs BOTH the ANN operator and the exact cosine top-k, emits the exact
side's deterministic counts plus a ``recall_ok`` boolean asserting a
measured floor, and the DuckDB oracle computes the exact counts and
asserts the boolean TRUE — so any bucketing/probing/scoring regression
in the ANN path breaks the hash, while the engine-specific neighbor
ids never cross the engine boundary.

Floors are calibrated against measured recall AND the broken-path
baseline (what a regressed implementation would score by reaching the
same scan volume with uninformative buckets/cells):

* SRP (4 bands × 5 planes): measured mean recall .296/.304/.303 at
  sf0.001/.01/.1; random-bucket baseline ≈ 1-(31/32)^4 ≈ .12.
  Floor 0.20 sits ≥1.48× above broken and ≥1.48× below measured.
* IVF (auto √n cells, n_probe=6): measured .68/.676/.516;
  random-cell baseline ≈ n_probe/n_cells ≤ .27.  Floor 0.40.

Both audits sample a FIXED-SIZE query set (``vec_id % 10 = 0 AND
vec_id < QUANT_RECALL_ID_CAP``, shared with embed_quant_recall): the
exact side is O(|queries|·n), so a corpus-fraction sample would make
the audit O(n²) — the exact trap the ×64 embeddings rung caught in
round 8.

Reference anchor: none of this exists in 18F/rdbms-subsetter (SURVEY
§2A "Not implemented by the reference"); it is BASELINE.json extension
surface (similarity-search quality contracts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import similarity
from rdbms_subsetter_spark.queries_ext15 import QUANT_RECALL_ID_CAP

#: Audited-floor constants — interpolated into docstrings/oracles so a
#: drift between operator and contract is impossible by construction.
SRP_RECALL_FLOOR = 0.20
IVF_RECALL_FLOOR = 0.40
#: Banded-SRP audit point: 4 independent signatures of 5 planes each.
SRP_AUDIT_BANDS = 4
SRP_AUDIT_PLANES = 5
#: IVF audit point: auto (√n) cells, 6 probed per query.
IVF_AUDIT_PROBE = 6


def _audit_queries(emb: DataFrame) -> DataFrame:
    return emb.filter(
        (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < QUANT_RECALL_ID_CAP)
    )


def _recall_audit(emb: DataFrame, ann: DataFrame, queries: DataFrame, floor: float, k: int) -> DataFrame:
    """One-row audit: exact-side counts + a recall-floor boolean.

    ``recall`` here is micro-averaged over exact top-k pairs:
    |ANN ∩ exact| / |exact|.  Both sides rank by the same 6-decimal
    rounded cosine with neighbor-id tiebreak, so the exact set is the
    same one the DuckDB oracle computes and the overlap is a
    deterministic fact of the input, not a random variable."""
    exact = similarity.cosine_topk(emb, queries, k=k).select("query_id", "neighbor_id")
    a = ann.select(F.col("query_id").alias("__q"), F.col("neighbor_id").alias("__n"))
    # ONE aggregate produces all three outputs (a separate count-of-
    # queries branch would need a single-row combine, which Catalyst
    # plans as the BNLJ the battery-wide plan gate forbids):
    # n_queries = distinct query ids in the exact top-k, identical to
    # the audit-sample count whenever every query has ≥1 neighbor
    # (guaranteed for any corpus with ≥2 vectors) — the same quantity
    # the oracle counts from its knn CTE.
    return (
        exact.join(
            a,
            (exact["query_id"] == a["__q"]) & (exact["neighbor_id"] == a["__n"]),
            "left",
        )
        .agg(
            F.countDistinct("query_id").alias("__nq"),
            F.count(F.lit(1)).alias("__pairs"),
            F.sum(F.when(F.col("__n").isNotNull(), 1).otherwise(0)).alias("__hits"),
        )
        .select(
            F.col("__nq").cast("long").alias("n_queries"),
            F.col("__pairs").cast("long").alias("n_exact_pairs"),
            # coalesce: a degenerate corpus (no audit queries, or <2
            # vectors) makes __pairs = 0 and the ratio NULL; a NULL
            # here would mismatch the oracle's literal TRUE with an
            # opaque hash diff instead of a deterministic FALSE
            # (ADVICE r09)
            F.coalesce(
                F.col("__hits") / F.col("__pairs") >= F.lit(floor), F.lit(False)
            ).alias("recall_ok"),
        )
    )


def q_ann_srp_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale recall contract for the SRP/LSH ANN path: banded
    signed-random-projection top-5 (4 bands × 5 planes — recall
    compounds 1-(1-r)⁴ across bands while candidates stay linear in
    bands) must recover ≥20% of the exact cosine top-5 pairs over the
    fixed audit query sample.  A regressed signature/bucketing path
    that scans the same volume with uninformative buckets scores ≈12%
    and breaks the hash; a broken scoring expression craters to ~0.

    The plane stream is the same seeded-md5 scheme the rows-only
    ``ann_srp_bucketed`` entry uses (``similarity.srp_signature``), so
    this IS that operator's quality gate at corpus SF."""
    cat = Catalog(spark, sf_dir)
    emb = cat["embeddings"]
    q = _audit_queries(emb)
    ann = similarity.srp_topk(
        emb, q, dim=64, k=5, n_planes=SRP_AUDIT_PLANES, n_bands=SRP_AUDIT_BANDS
    )
    return _recall_audit(emb, ann, q, SRP_RECALL_FLOOR, k=5)


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale recall contract for the IVF ANN path: k-means cells
    (auto √n) probing the 6 nearest cells per query must recover ≥40%
    of the exact cosine top-5 pairs over the fixed audit query sample.
    Random (uninformative) cells at the same probe volume score
    ≤ n_probe/n_cells ≈ 13–27% on the graded corpora and break the
    hash; so does a broken centroid fit or probe ranking."""
    cat = Catalog(spark, sf_dir)
    emb = cat["embeddings"]
    q = _audit_queries(emb)
    ann = similarity.ivf_topk(emb, q, k=5, n_clusters="auto", n_probe=IVF_AUDIT_PROBE)
    return _recall_audit(emb, ann, q, IVF_RECALL_FLOOR, k=5)


# The oracle computes the exact side only (count of audit queries and
# of exact top-5 pairs — both deterministic facts of the data) and
# asserts the recall boolean TRUE, per the sketch-error-bounds pattern.
_SQL_ANN_RECALL = f"""
WITH m AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
knn AS (
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
  WHERE rk <= 5)
SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS recall_ok
FROM knn
"""


def q_streaming_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See streaming.events.streaming_asof_enrich: stateless stream-
    static temporal enrichment (broadcast sorted order-history arrays +
    codegen as-of extraction), the streaming twin of
    ``asof_join_latest_order``."""
    from rdbms_subsetter_spark.streaming import events as streaming_events

    return streaming_events.streaming_asof_enrich(spark, sf_dir)


_SQL_STREAMING_ASOF = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_ts,
         CAST(round(100 * o_totalprice) AS BIGINT) AS o_cents
  FROM orders),
best AS (
  SELECT event_id, o_orderkey, o_cents FROM (
    SELECT p.event_id, o.o_orderkey, o.o_cents,
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY o.o_ts DESC, o.o_orderkey DESC) AS rk
    FROM p JOIN o ON o.o_custkey = p.user_id AND o.o_ts <= p.ts)
  WHERE rk = 1)
SELECT p.event_id, p.user_id,
       b.o_orderkey AS asof_orderkey, b.o_cents AS asof_cents
FROM p LEFT JOIN best b ON b.event_id = p.event_id
"""


def ext18_queries() -> dict:
    return {
        "ann_srp_recall": q_ann_srp_recall,
        "ann_ivf_recall": q_ann_ivf_recall,
        "streaming_asof_enrich": q_streaming_asof_enrich,
    }


def ext18_oracles() -> dict:
    return {
        "ann_srp_recall": _SQL_ANN_RECALL,
        "ann_ivf_recall": _SQL_ANN_RECALL,
        "streaming_asof_enrich": _SQL_STREAMING_ASOF,
    }
