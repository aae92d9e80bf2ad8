"""Round-10 battery growth (≤5 per the grading discipline, registered
LAST): cross-corpus exact-span decontamination over the suffix-run
classes, and the block-broadcast exact self-kNN graded through the
knn-graph audit it unlocks at corpus scale.

* ``decontaminate_substring`` — train-vs-eval exact substring
  containment (VERDICT r09 task 3): the leakage lens the existing pair
  misses — ``decontaminate_ngram`` is exact at a FIXED n,
  ``dedup_minhash_cross_corpus`` is fuzzy whole-doc; a verbatim eval
  span quoted inside an otherwise-novel training doc dodges both but
  never dodges an exact ≥8-token-run scan.
* ``knn_graph_blocked`` — the in-degree audit of the exact cosine 3-NN
  graph computed by ``cosine_topk_blocked`` (VERDICT r09 task 4): the
  block-matrix kernel with NO driver collect, so the 200k
  ``MAX_QUERY_VECTORS`` ceiling of the broadcast kernel does not
  apply.  Result-identical to ``knn_graph_degree`` by construction
  (property-asserted in tests/test_round10_property.py) — grading both
  pins the two kernels to the same exact answer.

Reference anchor: none of this exists in 18F/rdbms-subsetter (SURVEY
§2A "Not implemented by the reference"); both are BASELINE.json
extension surface (LLM-pipeline decontamination / similarity search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import dedup, similarity
from rdbms_subsetter_spark.queries_ext import _TOKS
from rdbms_subsetter_spark.queries_ext17 import _SUBSTR_MAX_RUN_FREQ, _SUBSTR_MIN_LEN

#: Corpus split shared with dedup_minhash_cross_corpus and
#: decontaminate_ngram: eval = doc_id % 10 == 0.
_EVAL_MOD = 10


def q_decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See operators.dedup.substring_decontaminate_pairs: exact longest
    shared token run ≥ 8 for every train×eval pair (eval = doc_id % 10
    == 0), run classes hotter than the family cap dropped before
    pairing.  Spark: prefix-doubling suffix classes + cross-split
    equi-join + Arrow exact-LCS verify; oracle: brute-force k-grams
    with the identical split and df cap."""
    cat = Catalog(spark, sf_dir)
    return dedup.substring_decontaminate_pairs(
        cat["documents"],
        min_len=_SUBSTR_MIN_LEN,
        eval_mod=_EVAL_MOD,
        max_run_freq=_SUBSTR_MAX_RUN_FREQ,
    )


_SQL_DECONTAM_SUBSTRING = f"""
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
  SELECT DISTINCT a.doc_id AS tr, b.doc_id AS ev
  FROM g8 a JOIN g8 b ON a.g = b.g
  JOIN cold8 c ON c.g = a.g
  WHERE a.doc_id % {_EVAL_MOD} <> 0 AND b.doc_id % {_EVAL_MOD} = 0)
SELECT a.doc_id AS train_doc_id, b.doc_id AS eval_doc_id,
       CAST(max(a.k) AS BIGINT) AS span_len
FROM grams a JOIN grams b ON a.g = b.g AND a.k = b.k
JOIN cand ON cand.tr = a.doc_id AND cand.ev = b.doc_id
GROUP BY 1, 2
"""


def q_knn_graph_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree distribution of the exact cosine 3-NN graph, computed
    by the block-broadcast kernel (``similarity.cosine_topk_blocked``):
    corpus × corpus in B×B block pairs over an equi-joined grid — no
    driver collect anywhere, so unlike ``knn_graph_degree`` (bounded-
    broadcast kernel) this path has no 200k corpus ceiling.  Block
    sizing is ``max(128, ceil(n/32))``: the 128 floor forces a real
    multi-block grid at every graded SF (500 vectors → 4 blocks / 16
    grid tasks; 2000 → 16 blocks / 256), while the n/32 term caps the
    grid at ~1024 tasks as the corpus grows (the ×64 rung's 128k
    vectors get 4k-vector blocks, ~130 MB of score matrix per task).
    Block size never changes the RESULT — exactness is property-
    asserted for single- and multi-block shapes.  Output and oracle
    are identical to knn_graph_degree: both kernels rank by the same
    rounded cosine + id tiebreak, so the graded pair pins them to the
    same exact answer."""
    import math

    cat = Catalog(spark, sf_dir)
    emb = cat["embeddings"]
    bs = max(128, math.ceil(emb.count() / 32))
    knn = similarity.cosine_topk_blocked(emb, k=3, block_size=bs)
    indeg = knn.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        emb.select("vec_id")
        .join(indeg, "vec_id", "left")
        .select(F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
        .groupBy("in_degree")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


_SQL_KNN_BLOCKED = """
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         round(list_dot_product(a.embedding, b.embedding)
               / (sqrt(list_dot_product(a.embedding, a.embedding))
                  * sqrt(list_dot_product(b.embedding, b.embedding))), 6) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
knn AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid
                                        ORDER BY cos DESC, nid) AS rk
    FROM pairs)
  WHERE rk <= 3),
indeg AS (SELECT nid, count(*) AS in_degree FROM knn GROUP BY nid)
SELECT in_degree, count(*) AS n_vectors FROM (
  SELECT coalesce(i.in_degree, 0) AS in_degree
  FROM embeddings e LEFT JOIN indeg i ON e.vec_id = i.nid)
GROUP BY in_degree
"""


#: Hot-bucket valve pinned on the GRADED simhash-pairs entry (round 10,
#: VERDICT r09 defect #2): candidate volume is Σ_{(chunk,value)}
#: C(df,2), and a near-identical-doc corpus detonates one bucket
#: without a cap.  16 matches the jaccard/substring family caps and is
#: inert on the graded corpus; one constant, interpolated into BOTH
#: the operator call and the oracle.
_SIMHASH_MAX_BUCKET_FREQ = 16
_SIMHASH_MAX_HAMMING = 3


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See operators.dedup.simhash_pairs: near-dup pairs with
    Hamming(simhash64) ≤ 3, candidates blocked on 16-bit signature
    chunks (pigeonhole-exact) with buckets hotter than the family cap
    dropped (CI tripwire in tests/test_scale_ratios.py).  The existing
    ``dedup_simhash`` entry grades only the SIGNATURES; this grades
    the full pair pipeline — blocking, the round-10 bucket valve, and
    the exact Hamming verify — end-to-end against an oracle that
    rebuilds the same chunks from its bit strings."""
    cat = Catalog(spark, sf_dir)
    pairs = dedup.simhash_pairs(
        cat["documents"],
        max_hamming=_SIMHASH_MAX_HAMMING,
        max_bucket_freq=_SIMHASH_MAX_BUCKET_FREQ,
    )
    return pairs.select(
        "doc_id_1", "doc_id_2", F.col("hamming").cast("long").alias("hamming")
    )


def _simhash_pairs_oracle(bits: int = 64) -> str:
    """Chunk blocking + df cap + exact Hamming, all over the SAME
    md5-derived bit string the graded ``dedup_simhash`` oracle emits:
    chunk c of doc d is ``substr(bitstr, c*16+1, 16)``, identical bit
    layout to the Spark side's numeric chunk values (equality of the
    16-char substring ⟺ equality of the numeric chunk)."""
    from rdbms_subsetter_spark.queries_ext import _TOKS

    sums = ", ".join(
        f"sum(CASE WHEN (CAST(('0x' || substr(md5('0|' || tok), 1, 15)) AS BIGINT) >> {b}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    bitstr = " || ".join(f"CASE WHEN s{b} > 0 THEN '1' ELSE '0' END" for b in range(bits))
    width = bits // 4
    return f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id),
sig AS (SELECT doc_id, {bitstr} AS s FROM sums),
chunks AS (
  SELECT doc_id, c, substr(s, c * {width} + 1, {width}) AS cv
  FROM sig, range(0, 4) t(c)),
cold AS (
  SELECT c, cv FROM (SELECT c, cv, count(*) AS df FROM chunks GROUP BY c, cv)
  WHERE df <= {_SIMHASH_MAX_BUCKET_FREQ}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
  JOIN cold k ON k.c = a.c AND k.cv = a.cv),
ham AS (
  SELECT d1, d2,
         (SELECT count(*) FROM range(1, {bits} + 1) g(i)
          WHERE substr(s1.s, CAST(i AS INT), 1) <> substr(s2.s, CAST(i AS INT), 1)) AS hamming
  FROM cand JOIN sig s1 ON s1.doc_id = d1 JOIN sig s2 ON s2.doc_id = d2)
SELECT d1 AS doc_id_1, d2 AS doc_id_2, CAST(hamming AS BIGINT) AS hamming
FROM ham WHERE hamming <= {_SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def ext19_queries() -> dict:
    return {
        "decontaminate_substring": q_decontaminate_substring,
        "knn_graph_blocked": q_knn_graph_blocked,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
    }


def ext19_oracles() -> dict:
    return {
        "decontaminate_substring": _SQL_DECONTAM_SUBSTRING,
        "knn_graph_blocked": _SQL_KNN_BLOCKED,
        "dedup_simhash_pairs": _simhash_pairs_oracle(64),
    }
