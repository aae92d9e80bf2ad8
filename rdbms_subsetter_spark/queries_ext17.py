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


def q_dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See operators.dedup.substring_dedup_pairs: exact longest common
    token-run per doc pair, pairs with lcs_len ≥ 8.  Spark computes it
    with O(tokens·log min_len) prefix-doubling suffix classes + an
    Arrow-batched exact verify; the oracle brute-forces every k-gram
    (O(Σ len²) — fine at sf0.01, the shape the Spark path exists to
    avoid)."""
    cat = Catalog(spark, sf_dir)
    return dedup.substring_dedup_pairs(cat["documents"], min_len=_SUBSTR_MIN_LEN)


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
  FROM pk)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST(max(a.k) AS BIGINT) AS lcs_len
FROM grams a JOIN grams b ON a.g = b.g AND a.k = b.k AND a.doc_id < b.doc_id
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
# registry
# ---------------------------------------------------------------------------


def ext17_queries() -> dict:
    return {
        "dedup_substring_exact": q_dedup_substring_exact,
        "window_salted_running_total": q_window_salted_running_total,
    }


def ext17_oracles() -> dict:
    return {
        "dedup_substring_exact": _SQL_SUBSTRING_EXACT,
        "window_salted_running_total": _SQL_SALTED_RUNNING_TOTAL,
    }
