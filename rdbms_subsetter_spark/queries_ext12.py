"""Graded queries, part 12 (round 2): model-based data selection — a
self-corpus bigram language-model quality score (the perplexity-proxy
filter) and DSIR-style hashed-n-gram importance weights.

Same contract as queries_core: identical aliases both sides, floats
rounded both sides, no array/map outputs (driver canonicalizer).

These are the two standard "model-based" curation signals a pretraining
pipeline adds on top of rule filters: LM likelihood (CCNet/KenLM-style
filtering) and distribution-matching importance weights (DSIR,
Xie et al. 2023) — both reduced to pure DataFrame algebra: counts,
windows, joins, logs.  No trained artifacts, so the whole signal is
reproducible from the corpus alone and oracle-checkable.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import text
from rdbms_subsetter_spark.queries_ext import _RAW_TOKS

# ---------------------------------------------------------------------------
# Bigram LM quality score
# ---------------------------------------------------------------------------


def q_quality_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average bigram log-likelihood under the corpus's own
    bigram MLE model: score(d) = mean over bigrams (w1,w2) of
    ln( C(w1,w2) / C(w1·) ), where C(w1·) counts w1 in first-of-bigram
    position.  Low scores mark repetitive-structure or out-of-domain
    documents — the KenLM/CCNet perplexity-filter shape without an
    external model artifact.

    Scale shape: the corpus is exploded into bigram positions ONCE; the
    model is the (w1,w2)-count table, reduced by a map-side-combined
    hash aggregate (shuffle volume = |bigram vocab|, not positions) —
    a window-over-positions formulation was measured 5× slower at sf0.1
    because it sorts every position twice.  The conditional denominator
    C(w1·) folds out of the bigram table itself (no second corpus
    pass), and the tiny model joins back by broadcast; with a web-scale
    vocabulary AQE falls back to a shuffle join on the same plan.  No
    driver-side model materialization either way."""
    cat = Catalog(spark, sf_dir)
    # stage the token array through a projection: lambdas are not
    # common-subexpression-eliminated, so element_at(tokens(text), i)
    # would re-run the split per element access (the quantize_int8
    # lesson — O(doc_len²) per doc)
    staged = cat["documents"].select(
        "doc_id", text.tokens(F.col("text")).alias("__t")
    )
    toks = F.col("__t")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pos = (
        staged.select("doc_id", F.explode(bigrams).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        # two consumers (model fit + scoring join): materialize the
        # explode once, same discipline as ngram_jaccard_pairs
        .localCheckpoint(eager=True)
    )
    bi = pos.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    # C(w1·) = times w1 is followed by anything = sum of its bigram rows
    uni = bi.groupBy("w1").agg(F.sum("c_bi").alias("c_first"))
    model = bi.join(uni, "w1").select(
        "w1",
        "w2",
        F.log(F.col("c_bi").cast("double") / F.col("c_first").cast("double")).alias(
            "lp"
        ),
    )
    scored = pos.join(F.broadcast(model), ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


_SQL_LM_SCORE = f"""
WITH toks AS (SELECT doc_id, {_RAW_TOKS} AS t FROM documents),
pos AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
  FROM toks),
flat AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM pos),
scored AS (
  SELECT doc_id,
         ln(CAST(count(*) OVER (PARTITION BY w1, w2) AS DOUBLE)
            / CAST(count(*) OVER (PARTITION BY w1) AS DOUBLE)) AS lp
  FROM flat)
SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 4) AS avg_logprob
FROM scored
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_SEED = 11


def _bucket(col: F.Column) -> F.Column:
    """Portable md5-derived feature bucket (cross-engine identical)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{_DSIR_SEED}|"), col)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(_DSIR_BUCKETS))


_BUCKET_SQL = (
    f"CAST(('0x' || substr(md5('{_DSIR_SEED}|' || tok), 1, 15)) AS BIGINT) "
    f"% {_DSIR_BUCKETS}"
)


def q_mixture_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: hashed-unigram features (64
    buckets), target distribution = English documents, source = whole
    corpus; each document's raw log-weight is the mean over its tokens
    of ln( p_target(bucket) / p_source(bucket) ) with add-one smoothing.
    High weight ⇒ the document looks like the target domain — sampling
    by these weights is importance resampling toward the target.

    Scale shape: the 64-row smoothed distribution table aggregates once
    over the exploded token stream and BROADCASTS back onto it; the
    stream itself is shuffled only for the final per-doc re-group.  The
    'model' is 64 rows regardless of corpus size — this is exactly why
    hashed features scale where raw-vocabulary features don't."""
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"]
    toks = (
        docs.select("doc_id", "lang", F.explode(text.tokens(F.col("text"))).alias("tok"))
        .select("doc_id", "lang", _bucket(F.col("tok")).alias("b"))
    )
    dist = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum((F.col("lang") == "en").cast("long")).alias("n_tgt"),
    )
    # totals via a window over the 64-row dist frame (a 1-row-aggregate
    # cross join would plan a BroadcastNestedLoopJoin for nothing)
    w_all = Window.partitionBy()
    probs = dist.select(
        "b",
        (
            (F.col("n_tgt") + 1) / (F.sum("n_tgt").over(w_all) + _DSIR_BUCKETS)
        ).alias("p_tgt"),
        (
            (F.col("n_src") + 1) / (F.sum("n_src").over(w_all) + _DSIR_BUCKETS)
        ).alias("p_src"),
    )
    weighted = toks.join(F.broadcast(probs), "b").select(
        "doc_id", F.log(F.col("p_tgt") / F.col("p_src")).alias("lr")
    )
    return weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.round(F.avg("lr"), 4).alias("dsir_logweight"),
    )


_SQL_DSIR = f"""
WITH toks AS (
  SELECT doc_id, lang, {_BUCKET_SQL} AS b
  FROM (SELECT doc_id, lang, unnest({_RAW_TOKS}) AS tok FROM documents)),
dist AS (
  SELECT b, count(*) AS n_src,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt
  FROM toks GROUP BY b),
probs AS (
  SELECT b,
         (n_tgt + 1) * 1.0 / (sum(n_tgt) OVER () + {_DSIR_BUCKETS}) AS p_tgt,
         (n_src + 1) * 1.0 / (sum(n_src) OVER () + {_DSIR_BUCKETS}) AS p_src
  FROM dist)
SELECT doc_id, count(*) AS n_tok,
       round(avg(ln(p_tgt / p_src)), 4) AS dsir_logweight
FROM toks JOIN probs USING (b)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# PCA projection of the embedding table
# ---------------------------------------------------------------------------


def q_embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 PCA projection of the embeddings (distributed partial
    covariance fit + literal-basis codegen projection — see
    operators.similarity.pca_fit_project).  Rows-only gate: no SQL
    engine exposes an eigensolver; numpy parity is unit-tested in
    tests/test_operators.py."""
    from rdbms_subsetter_spark.operators import similarity

    cat = Catalog(spark, sf_dir)
    return similarity.pca_fit_project(cat["embeddings"], n_components=2)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_AES_SEED = 29
_AES_K = 100


def q_sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    A-ES: each row draws u ∈ (0,1) and the sample is the top-k rows by
    key u^(1/w) — one pass, no rejection loop, exactly k rows, and
    inclusion probability proportional to weight.  The classic
    distributed answer (per-partition top-k heaps + driver merge via
    TakeOrderedAndProject — the corpus is never globally sorted).

    u is a seeded md5-derived uniform, so the 'random' draw is
    bit-identical in any engine — the same determinism contract as the
    subset sampler (reference ``subsetter.py::_random_row_func`` used
    dialect random(); we make the stream reproducible instead).
    Weights = order totalprice: big orders are proportionally more
    likely to be sampled, the standard revenue-weighted audit draw."""
    cat = Catalog(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{_AES_SEED}|"), F.col("o_orderkey").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(16**15 + 1))  # (0,1], never 0
    key = F.pow(u, F.lit(1.0) / F.col("o_totalprice"))
    return (
        cat["orders"]
        .where(F.col("o_totalprice") > 0)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("weight"),
            F.round(key, 9).alias("aes_key"),
        )
        .orderBy(F.desc("aes_key"), "o_orderkey")
        .limit(_AES_K)
    )


_SQL_SAMPLE_WEIGHTED = f"""
WITH keyed AS (
  SELECT o_orderkey,
         round(o_totalprice, 2) AS weight,
         pow((CAST(('0x' || substr(md5('{_AES_SEED}|' || o_orderkey), 1, 15)) AS BIGINT) + 1.0)
             / (power(16, 15) + 1), 1.0 / o_totalprice) AS k
  FROM orders WHERE o_totalprice > 0)
SELECT o_orderkey, weight, round(k, 9) AS aes_key
FROM keyed
-- order by the ROUNDED key (as Spark does): the 1e-9 tie granularity
-- absorbs cross-engine pow() last-ulp differences at the k-th cutoff
ORDER BY aes_key DESC, o_orderkey
LIMIT {_AES_K}
"""


# ---------------------------------------------------------------------------
# Null semantics battery
# ---------------------------------------------------------------------------


def q_sql_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic battery over a column with injected nulls:
    null-safe equality (Spark ``<=>`` ≡ SQL IS NOT DISTINCT FROM),
    NULLIF/COALESCE chains, count(col) vs count(*) null skipping, and
    NULLS FIRST ordering — the semantics corner every engine must agree
    on exactly.  One scan, one tiny aggregate."""
    cat = Catalog(spark, sf_dir)
    # deterministic null injection: every 7th supplier's acctbal
    s = cat["supplier"].select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 7 != 0, F.col("s_acctbal")).alias("bal"),
        F.col("s_nationkey"),
    )
    nullsafe_zero = F.expr("bal <=> CAST(NULL AS DOUBLE)")
    return s.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("bal").alias("n_nonnull"),
        F.sum(nullsafe_zero.cast("long")).alias("n_nullsafe_null"),
        F.sum(F.nullif(F.col("s_nationkey"), F.lit(0)).isNull().cast("long")).alias(
            "n_nullif_zero"
        ),
        F.round(F.sum(F.coalesce(F.col("bal"), F.lit(0.0))), 2).alias("sum_coalesced"),
        F.min(F.when(F.col("bal").isNull(), F.col("s_suppkey"))).alias(
            "first_null_key"
        ),
    )


_SQL_NULL_SEMANTICS = """
WITH s AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 7 != 0 THEN s_acctbal END AS bal,
         s_nationkey
  FROM supplier)
SELECT count(*) AS n_rows,
       count(bal) AS n_nonnull,
       CAST(sum(CASE WHEN bal IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null,
       CAST(sum(CASE WHEN nullif(s_nationkey, 0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullif_zero,
       round(sum(coalesce(bal, 0.0)), 2) AS sum_coalesced,
       min(CASE WHEN bal IS NULL THEN s_suppkey END) AS first_null_key
FROM s
"""


# ---------------------------------------------------------------------------
# Observation API metrics
# ---------------------------------------------------------------------------


def q_dq_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-attached runtime metrics via the DataFrame ``observe`` API:
    the same pass that materializes a filtered projection also records
    its audit metrics (row count, null count, sum) with ZERO extra scans
    — at 100 TB this is how per-job data-quality counters ship without a
    second aggregation job.  The observed values are returned as a
    one-row frame; the oracle recomputes them declaratively."""
    from pyspark.sql import Observation

    cat = Catalog(spark, sf_dir)
    obs = Observation("dq")
    observed = (
        cat["orders"]
        .where(F.col("o_orderstatus") == "O")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_open"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "open_cents"
            ),
            F.count_if(F.col("o_custkey").isNull()).alias("n_null_custkey"),
        )
    )
    observed.write.format("noop").mode("overwrite").save()  # drive the pass
    m = obs.get
    return spark.createDataFrame(
        [(m["n_open"], m["open_cents"], m["n_null_custkey"])],
        "n_open long, open_cents long, n_null_custkey long",
    )


_SQL_OBSERVED_METRICS = """
SELECT count(*) AS n_open,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS open_cents,
       count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_null_custkey
FROM orders
WHERE o_orderstatus = 'O'
"""


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance
# ---------------------------------------------------------------------------


def q_incr_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the per-type
    daily-revenue aggregate is 'maintained' by combining the frozen
    pre-watermark aggregate with the delta aggregate of rows that
    arrived after it — algebraically, never by re-scanning history.
    The oracle computes the same aggregate directly over all rows, so
    the hash gate proves base ⊕ delta ≡ full recompute (the correctness
    condition of incremental view maintenance).

    Scale shape: at 100 TB the base side is a stored aggregate read
    (tiny); only the delta partition is scanned per refresh.  Count and
    integer-cents sum are the algebraic (commutative-monoid) merge."""
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    # empty input: max(ts) is NULL -> any watermark works (base and
    # delta are both empty); epoch keeps the arithmetic total
    wm_max = ev.agg(F.max("ts")).collect()[0][0]
    wm = (wm_max or _dt.datetime(1970, 1, 1)) - _dt.timedelta(days=7)
    cents = F.round(F.col("value") * 100).cast("long")

    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("sum_cents")
        )

    base = agg_of(ev.where(F.col("ts") <= F.lit(wm)))
    delta = agg_of(ev.where(F.col("ts") > F.lit(wm)))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("sum_cents").alias("sum_cents"))
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_cents") / 100.0, 2).alias("total_value"),
    )


_SQL_INCR_AGG = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS total_value
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Streaming ingest-quality funnel
# ---------------------------------------------------------------------------


def q_streaming_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live crawler-ingest quality monitor: the curation funnel's rule
    stages as one running streaming aggregate (complete-mode replay ≡
    the batch counts, shared oracle).  See
    streaming.events.streaming_curation_funnel."""
    from rdbms_subsetter_spark.streaming import events as streaming_events

    return streaming_events.streaming_curation_funnel(spark, sf_dir)


_SQL_STREAMING_FUNNEL = f"""
WITH flagged AS (
  SELECT (lang = 'en') AS s1,
         round((least(len({_RAW_TOKS}) / 100.0, 1.0)
               + least(len(list_filter({_RAW_TOKS}, t -> list_contains(['the','a','of','and','to','in','is','that'], t))) * 1.0
                       / len({_RAW_TOKS}) * 5.0, 1.0)
               + greatest(0.0, 1.0 - ((length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                                       * 1.0 / length(text)) * 4.0)) / 3.0, 6) AS q,
         len({_RAW_TOKS}) AS n_tok
  FROM documents)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
       CAST(sum(CASE WHEN s1 AND q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN s1 AND q >= 0.5 AND n_tok BETWEEN 20 AND 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_length
FROM flagged
"""


# ---------------------------------------------------------------------------
# Directed n-gram containment (quote-inclusion dedup)
# ---------------------------------------------------------------------------


def q_dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs C(A⊂B) = |sh(A)∩sh(B)|/|sh(A)| ≥ 0.9 —
    the asymmetric near-dup that Jaccard misses (short doc fully quoted
    inside a long one).  See operators.dedup.ngram_containment_pairs.

    Round 10: pins ``max_doc_freq`` to the shingle family's shared cap
    (operator + oracle in lockstep, regraded) — this was the last
    shingle operator graded in its uncapped configuration, i.e. the
    last inverted-index self-join whose candidate volume could go
    Σ_shingle C(df, 2) on a boilerplate-heavy corpus.  Hot shingles
    are dropped from the index AND the containment denominators,
    identically in both engines, the jaccard-entry precedent.  The cap
    is inert on the graded corpus (no trigram df exceeds the cap at
    any graded SF; outputs verified identical) — it exists for the
    boilerplate-heavy shape, exactly like the substring family's."""
    from rdbms_subsetter_spark.operators import dedup
    from rdbms_subsetter_spark.queries_ext import NGRAM_MAX_DOC_FREQ

    cat = Catalog(spark, sf_dir)
    return dedup.ngram_containment_pairs(
        cat["documents"], n=3, threshold=0.9, max_doc_freq=NGRAM_MAX_DOC_FREQ
    )


def _containment_cte() -> str:
    from rdbms_subsetter_spark.queries_ext import (
        NGRAM_MAX_DOC_FREQ,
        _capped_shingle_cte,
        _shingle_cte,
    )

    return f"""
WITH {_shingle_cte(3)},
{_capped_shingle_cte(NGRAM_MAX_DOC_FREQ)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS shared
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
both_sides AS (
  SELECT doc_id_1, doc_id_2, shared, n1.n_sh AS n1, n2.n_sh AS n2
  FROM shared
  JOIN sizes n1 ON doc_id_1 = n1.doc_id
  JOIN sizes n2 ON doc_id_2 = n2.doc_id),
directed AS (
  SELECT doc_id_1 AS contained_id, doc_id_2 AS container_id,
         round(shared * 1.0 / n1, 6) AS containment FROM both_sides
  UNION ALL
  SELECT doc_id_2 AS contained_id, doc_id_1 AS container_id,
         round(shared * 1.0 / n2, 6) AS containment FROM both_sides)
SELECT contained_id, container_id, containment
FROM directed WHERE containment >= 0.9
"""


# ---------------------------------------------------------------------------
# Token-level Shannon entropy
# ---------------------------------------------------------------------------


def q_text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token Shannon entropy H = log2(n) − (Σ c·log2 c)/n —
    the repetition/diversity signal complementary to the trigram
    repetition ratio (low entropy = boilerplate or degenerate loops,
    high = diverse vocabulary).  One explode + two groupBys, both keyed
    by doc (the (doc, token) pre-aggregation bounds the second shuffle
    by unique-tokens-per-doc)."""
    cat = Catalog(spark, sf_dir)
    counts = (
        cat["documents"]
        .select("doc_id", F.explode(text.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("n_unique"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 4
        ).alias("token_entropy"),
    )


_SQL_TOKEN_ENTROPY = f"""
WITH counts AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest({_RAW_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tok,
       count(*) AS n_unique,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS token_entropy
FROM counts
GROUP BY doc_id
"""


def ext12_queries() -> dict:
    return {
        "quality_lm_score": q_quality_lm_score,
        "mixture_dsir_weights": q_mixture_dsir_weights,
        "embed_pca_project": q_embed_pca_project,
        "dedup_ngram_containment": q_dedup_ngram_containment,
        "text_token_entropy": q_text_token_entropy,
        "streaming_curation_funnel": q_streaming_curation_funnel,
        "dq_observed_metrics": q_dq_observed_metrics,
        "incr_agg_maintenance": q_incr_agg_maintenance,
        "sql_null_semantics": q_sql_null_semantics,
        "sample_weighted_topk": q_sample_weighted_topk,
    }


def ext12_oracles() -> dict:
    return {
        "quality_lm_score": _SQL_LM_SCORE,
        "mixture_dsir_weights": _SQL_DSIR,
        "embed_pca_project": None,  # rows-only: eigensolver has no SQL twin
        "dedup_ngram_containment": _containment_cte(),
        "text_token_entropy": _SQL_TOKEN_ENTROPY,
        "streaming_curation_funnel": _SQL_STREAMING_FUNNEL,
        "dq_observed_metrics": _SQL_OBSERVED_METRICS,
        "incr_agg_maintenance": _SQL_INCR_AGG,
        "sql_null_semantics": _SQL_NULL_SEMANTICS,
        "sample_weighted_topk": _SQL_SAMPLE_WEIGHTED,
    }
