"""Extension battery 5: corpus-curation operators for training-data
pipelines — deterministic mixture sampling, benchmark decontamination,
and SemDeDup semantic deduplication.

These continue past the reference surface (18F/rdbms-subsetter has no
analytics at all — see SURVEY.md §2A boundary note) into the
LLM-pipeline operator set BASELINE.json's north star names.  The
sampling query is the set-at-a-time, engine-portable answer to the
reference's seeded random sampling (`subsetter.py::_random_row_func`):
hash-Bernoulli on the key instead of `ORDER BY random()`, so the same
rows are kept on any engine, any partitioning, any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark.catalog import Catalog

# per-language target keep-rates for the mixture (basis points so the
# comparison against the hash bucket is exact integer arithmetic)
_MIX_BPS = {"en": 9000, "de": 6000, "fr": 6000, "es": 4000, "zh": 3000}


def _hash_bucket(col):
    """Deterministic uniform bucket in [0, 10000) from md5 of the key —
    bit-identical in Spark and DuckDB (engine-portable md5 convention,
    see dedup._portable_hash)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 10000


def q_mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture construction: per-language weighted Bernoulli
    sampling with a DETERMINISTIC hash of the key (md5 bucket < rate),
    not ``rand()``.  That determinism is the production property: the
    kept set is reproducible across engines, retries, and repartitions
    — speculative task re-execution cannot change the sample, and a
    resumed 100 TB run keeps exactly the rows it kept before.  One
    scan, no shuffle before the final tiny per-lang aggregate; the
    rate lookup is a literal CASE so it stays inside codegen."""
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"]
    rate = F.lit(None).cast("long")
    expr = None
    for lang, bps in _MIX_BPS.items():
        expr = (
            F.when(F.col("lang") == lang, F.lit(bps))
            if expr is None
            else expr.when(F.col("lang") == lang, F.lit(bps))
        )
    rate = expr.otherwise(F.lit(2000))
    keep = (_hash_bucket(F.col("doc_id")) < rate).cast("int")
    return (
        docs.select("lang", "n_chars", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").alias("n_kept"),
            F.round(F.sum("keep") / F.count(F.lit(1)), 4).alias("rate_realized"),
            F.sum(F.col("keep") * F.col("n_chars")).alias("chars_kept"),
        )
    )


def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-gram with the held-out eval split (doc_id % 20 == 0 plays the
    benchmark).  The eval shingle set is small by construction — the
    whole point of the operator — so it is BROADCAST: the 100 TB
    training corpus is scanned once, shingled in place, and probed
    against the in-memory eval index with no shuffle of the big side.
    5-grams (not 3) because decontamination wants high-precision
    matches; at test SF the only hits are the planted near-dup pairs."""
    from rdbms_subsetter_spark.operators import dedup

    cat = Catalog(spark, sf_dir)
    sh = dedup.shingles(cat["documents"], n=5)
    ev = sh.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    tr = sh.filter(F.col("doc_id") % 20 != 0)
    return (
        tr.join(F.broadcast(ev), on="shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_ngrams"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
    )


def q_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: k-means cells + intra-cell
    cosine near-dup drop; per-cell (n_vectors, n_kept) summary.
    Iterative k-means → rows-only check (the keep-rule is unit-tested
    against a brute-force oracle in tests/test_operators.py)."""
    from rdbms_subsetter_spark.operators import similarity

    cat = Catalog(spark, sf_dir)
    return similarity.semdedup(
        cat["embeddings"], n_clusters="auto", threshold=0.95, seed=42
    )


def ext5_queries() -> dict:
    return {
        "mixture_weighted_sample": q_mixture_weighted_sample,
        "decontaminate_ngram": q_decontaminate_ngram,
        "dedup_semdedup": q_dedup_semdedup,
    }


def ext5_oracles() -> dict:
    from rdbms_subsetter_spark.queries_ext import _shingle_cte

    rate_case = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN {bps}" for lang, bps in _MIX_BPS.items()
    ) + " ELSE 2000 END"
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"
    )
    return {
        "mixture_weighted_sample": f"""
WITH flagged AS (
  SELECT lang, n_chars,
         CASE WHEN {bucket} < {rate_case} THEN 1 ELSE 0 END AS keep
  FROM documents)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       round(sum(keep) * 1.0 / count(*), 4) AS rate_realized,
       CAST(sum(keep * n_chars) AS BIGINT) AS chars_kept
FROM flagged GROUP BY lang
""",
        "decontaminate_ngram": f"""
WITH {_shingle_cte(5)},
ev AS (SELECT doc_id AS eval_doc, shingle FROM sh WHERE doc_id % 20 = 0),
tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0)
SELECT tr.doc_id,
       count(DISTINCT tr.shingle) AS n_shared_ngrams,
       count(DISTINCT ev.eval_doc) AS n_eval_docs
FROM tr JOIN ev ON tr.shingle = ev.shingle
GROUP BY tr.doc_id
""",
    }
