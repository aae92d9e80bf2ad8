"""Graded queries, part 9 (round 2): training-data compliance and
data-layout operators — PII redaction, deterministic shard assignment,
Z-order clustering, and the full curation funnel report.

Same contract as queries_core: identical aliases both sides, floats
rounded both sides, no array/map outputs (driver canonicalizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark import partitioning
from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import text
from rdbms_subsetter_spark.queries_ext import _EN_STOP, _NORM, _RAW_TOKS

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def _augmented_text() -> F.Column:
    """documents.text is synthetic word-salad with no PII, so the graded
    query plants deterministic doc_id-derived PII (an email, a phone, an
    IPv4, and a second email on every third doc) before scrubbing — the
    operator itself is general."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did,
        F.lit("@example.com ph 555-"),
        F.lpad(F.pmod(F.col("doc_id"), 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod(F.col("doc_id"), 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        F.pmod(F.col("doc_id"), 256).cast("string"),
        F.lit(".7"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" cc admin"), did, F.lit("@corp.example.org")),
        ).otherwise(F.lit("")),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub + audit counts over documents (emails / phones / IPv4
    placed deterministically from doc_id).  Redacted text is reported as
    md5 + length so the full scrubbed string is hash-verified without
    shipping megabyte rows through the grader."""
    cat = Catalog(spark, sf_dir)
    aug = cat["documents"].select("doc_id", _augmented_text().alias("text"))
    red = text.redact_pii(aug)
    return red.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.md5("text_redacted").alias("redacted_md5"),
        F.length("text_redacted").alias("redacted_len"),
    )


_AUG_SQL = (
    "text || ' contact user' || doc_id || '@example.com ph 555-' "
    "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "|| ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' "
    "|| CASE WHEN doc_id % 3 = 0 "
    "        THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END"
)

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[- ]\d{3}[- ]?\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_SQL_PII_REDACT = f"""
WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS INT) AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
             '{_PII_EMAIL}', '[EMAIL]', 'g'),
             '{_PII_PHONE}', '[PHONE]', 'g'),
             '{_PII_IPV4}', '[IPV4]', 'g')) AS redacted_md5,
       CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
             '{_PII_EMAIL}', '[EMAIL]', 'g'),
             '{_PII_PHONE}', '[PHONE]', 'g'),
             '{_PII_IPV4}', '[IPV4]', 'g')) AS INT) AS redacted_len
FROM aug
"""


# ---------------------------------------------------------------------------
# Deterministic shard assignment (resumable data-loader order)
# ---------------------------------------------------------------------------


def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return partitioning.shard_assignment(
        cat["documents"].select("doc_id"), "doc_id", n_shards=8, seed=42
    ).select("doc_id", "shard", "position")


_SQL_SHARD_ASSIGNMENT = """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('42|' || doc_id), 1, 15)) AS BIGINT) AS sort_key
  FROM documents)
SELECT doc_id,
       CAST(sort_key % 8 AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY sort_key % 8
                               ORDER BY sort_key, doc_id) AS INT) AS position
FROM h
"""


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key
# ---------------------------------------------------------------------------

_Z_BITS = 12


def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleaved layout key over (customer, order-age) for
    orders — the sort key a Delta/Iceberg OPTIMIZE ZORDER writes by.
    Exact per-row z-values are graded (pure bitwise codegen, identical
    arithmetic in the oracle); the z_bucket prefix is what file-level
    clustering would split on."""
    cat = Catalog(spark, sf_dir)
    x = F.pmod(F.col("o_custkey"), F.lit(1 << _Z_BITS))
    y = F.pmod(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")), F.lit(1 << _Z_BITS)
    )
    z = partitioning.z_value(x, y, bits=_Z_BITS)
    return cat["orders"].select(
        "o_orderkey",
        x.cast("int").alias("zx"),
        y.cast("int").alias("zy"),
        z.alias("z_val"),
        F.shiftright(z, 16).cast("int").alias("z_bucket"),
    )


def _z_terms_sql(xs: str, ys: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({ys} >> {i}) % 2) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


_SQL_ZORDER_CLUSTER = f"""
WITH b AS (
  SELECT o_orderkey,
         o_custkey % {1 << _Z_BITS} AS zx,
         date_diff('day', DATE '1992-01-01', o_orderdate) % {1 << _Z_BITS} AS zy
  FROM orders)
SELECT o_orderkey,
       CAST(zx AS INT) AS zx,
       CAST(zy AS INT) AS zy,
       CAST({_z_terms_sql('zx', 'zy', _Z_BITS)} AS BIGINT) AS z_val,
       CAST(({_z_terms_sql('zx', 'zy', _Z_BITS)}) // 65536 AS INT) AS z_bucket
FROM b
"""


# ---------------------------------------------------------------------------
# Curation funnel: the full corpus-filtering report in one aggregate
# ---------------------------------------------------------------------------


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage retention of the pretraining curation chain — total →
    lang filter → quality filter → length band → exact-dedup — computed
    in ONE scan + one aggregate: each stage is a cumulative boolean
    flag, and the dedup stage is count(DISTINCT fingerprint) over the
    final survivors (no second pass, no window)."""
    cat = Catalog(spark, sf_dir)
    t = F.col("text")
    flagged = cat["documents"].select(
        (F.col("lang") == "en").alias("s1"),
        text.quality_score(t).alias("q"),
        text.token_count(t).alias("n_tok"),
        text.fingerprint(t).alias("fp"),
    )
    s2 = F.col("s1") & (F.col("q") >= 0.5)
    s3 = s2 & F.col("n_tok").between(20, 1000)
    return flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("s1").cast("long")).alias("n_lang"),
        F.sum(s2.cast("long")).alias("n_quality"),
        F.sum(s3.cast("long")).alias("n_length"),
        F.count_distinct(F.when(s3, F.col("fp"))).alias("n_dedup"),
    )


_SQL_CURATION_FUNNEL = f"""
WITH flagged AS (
  SELECT (lang = 'en') AS s1,
         round((least(len({_RAW_TOKS}) / 100.0, 1.0)
               + least(len(list_filter({_RAW_TOKS}, t -> list_contains({_EN_STOP}, t))) * 1.0
                       / len({_RAW_TOKS}) * 5.0, 1.0)
               + greatest(0.0, 1.0 - ((length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                                       * 1.0 / length(text)) * 4.0)) / 3.0, 6) AS q,
         len({_RAW_TOKS}) AS n_tok,
         md5({_NORM}) AS fp
  FROM documents)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
       CAST(sum(CASE WHEN s1 AND q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN s1 AND q >= 0.5 AND n_tok BETWEEN 20 AND 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_length,
       count(DISTINCT CASE WHEN s1 AND q >= 0.5 AND n_tok BETWEEN 20 AND 1000 THEN fp END) AS n_dedup
FROM flagged
"""


def ext9_queries() -> dict:
    return {
        "pii_redact": q_pii_redact,
        "shard_assignment": q_shard_assignment,
        "zorder_cluster": q_zorder_cluster,
        "curation_funnel": q_curation_funnel,
    }


def ext9_oracles() -> dict:
    return {
        "pii_redact": _SQL_PII_REDACT,
        "shard_assignment": _SQL_SHARD_ASSIGNMENT,
        "zorder_cluster": _SQL_ZORDER_CLUSTER,
        "curation_funnel": _SQL_CURATION_FUNNEL,
    }
