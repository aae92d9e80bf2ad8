"""Graded queries, part 2: the SURVEY.md §2B extension surface —
joins/aggs/windows/set-ops/scalar-fns/JSON (classic OLAP) plus the
LLM-pipeline operators (dedup, similarity, text analysis, multimodal,
streaming).  Same contract as queries_core: identical aliases on both
sides, floats rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import dedup, multimodal, similarity, text
from rdbms_subsetter_spark.streaming import events as streaming_events

# ---------------------------------------------------------------------------
# OLAP: aggregation / joins / windows / set ops / scalar / json
# ---------------------------------------------------------------------------


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped aggregation (map-side partials + final, one shuffle)."""
    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"].filter(F.col("l_shipdate") <= "2000-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join + agg: revenue per customer nation (Q5-shaped).
    nation/customer are broadcast by AQE; lineitem⋈orders shuffles once."""
    cat = Catalog(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cat["lineitem"]
        .join(cat["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_window_rank_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windows: per-customer order rank + running spend."""
    cat = Catalog(spark, sf_dir)
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cat["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w_rank).alias("rnk"),
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over customer key sets."""
    cat = Catalog(spark, sf_dir)
    building = cat["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = cat["orders"].select(F.col("o_custkey").alias("c_custkey")).distinct()
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(building.intersect(with_orders), "intersect")
        .unionByName(tag(building.exceptAll(with_orders).distinct(), "except"))
        .unionByName(tag(building.union(with_orders).distinct(), "union"))
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar surface on part (all codegen, no UDFs)."""
    cat = Catalog(spark, sf_dir)
    return cat["part"].select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length(F.col("p_name")).alias("name_len"),
        F.substring(F.col("p_type"), 1, 3).alias("type_prefix"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        (F.col("p_size") % 5).alias("size_mod5"),
        F.round(F.sqrt(F.col("p_retailprice")), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("price_ln"),
        F.ceil(F.col("p_retailprice")).alias("price_ceil"),
        F.floor(F.col("p_retailprice")).alias("price_floor"),
    )


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface on orders."""
    cat = Catalog(spark, sf_dir)
    d = F.col("o_orderdate")
    return cat["orders"].select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01")).alias("days_since_epoch0"),
    )


def q_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props + aggregate per event type.

    ``try_cast``: props is untrusted JSON — a non-numeric k would throw
    CAST_INVALID_INPUT under ANSI mode; NULL (matching the oracle's
    TRY_CAST) is the ETL-correct behavior."""
    cat = Catalog(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return (
        cat["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, batch form (streaming twin below)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user via lag + cumsum."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    starts = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    sess = (
        cat["events"]
        .select("user_id", "ts", "event_id", starts.alias("is_start"))
        .withColumn("session_id", F.sum("is_start").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: dedup / similarity / text / multimodal
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return dedup.exact_dedup_groups(cat["documents"])


#: Graded hot-shingle cap for the n-gram dedup family (round 7): a
#: shingle appearing in more than this many docs is dropped from both
#: the inverted index AND the size denominators, in Spark and the
#: DuckDB oracle alike.  With an absolute cap the candidate volume is
#: Σ_shingle min(df, cap)² ≤ cap · Σ df = cap · (total shingle rows) —
#: LINEAR in corpus size, vs the uncapped Σ df² that the ×8 scale
#: stress measured at 16.4× (boilerplate shingles fan quadratically).
#: cap=16 keeps semantics essentially intact on the test corpora
#: (255/256 pairs at sf0.1 survive; nothing fires at sf0.01's max
#: df=7) while smaller caps measurably DISTORT Jaccard (cap=4 at
#: sf0.1: 750 "pairs" at θ=0.8, mostly denominators collapsing).
NGRAM_MAX_DOC_FREQ = 16


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped configuration (production form): hot shingles with
    df > NGRAM_MAX_DOC_FREQ are excluded before the self-join; the
    exact uncapped semantics remain available as ``max_doc_freq=None``
    (fuzz-covered; the grading-continuity twin was retired in round 8
    once this capped entry held its own green verdict)."""
    cat = Catalog(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(
        cat["documents"], n=3, threshold=0.8, max_doc_freq=NGRAM_MAX_DOC_FREQ
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return dedup.minhash_lsh_pairs(cat["documents"], num_hashes=16, bands=4, threshold=0.5)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-char bit string of the simhash, LSB (bit 0) first — unchanged
    output; r11 derives it from the packed one-long signature
    (``bin`` prints the 64-bit two's-complement MSB-first, so
    ``reverse(lpad(...))`` is exactly the bit0-first concatenation the
    per-bit-column form produced, in 3 expressions instead of 128 —
    the wide form spent ~1.5 s per run in plan optimization alone)."""
    cat = Catalog(spark, sf_dir)
    sig = dedup._simhash_sig(cat["documents"], bits=64)
    return sig.select(
        "doc_id",
        F.reverse(F.lpad(F.bin("sig"), 64, "0")).alias("simhash_bits"),
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SRP-LSH candidate generation + exact cosine verify.

    Threshold 0.4 because the synthetic embeddings are i.i.d. random
    (max pairwise cosine ~0.55 — nothing survives a realistic 0.95, and
    LSH recall at low thresholds is intentionally partial); the graded
    semantics are the LSH candidate pipeline itself, which the oracle
    reproduces plane-for-plane from the same md5 stream.

    ``planes_per_band="auto"`` (round 7): both engines derive the plane
    count from COUNT(*) via the identical floor(log2(n/16))+1 formula
    (similarity.auto_planes_per_band ↔ the oracle's params CTE), so
    bucket occupancy — and with it candidate volume per vector — stays
    constant as the corpus grows, instead of the 34×-at-×64 blowup the
    stress harness measured at a pinned plane count.  At the graded
    SFs (n=500/2000) the formula resolves to the floor of 8 planes,
    bit-identical to the previous pinned configuration."""
    cat = Catalog(spark, sf_dir)
    return similarity.cosine_near_dup_pairs(
        cat["embeddings"], threshold=0.4, dim=64, n_bands=8, planes_per_band="auto"
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    emb = cat["embeddings"]
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.cosine_topk(emb, queries, k=5)


def q_ann_srp_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    emb = cat["embeddings"]
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.srp_topk(emb, queries, dim=64, k=5, n_planes=6)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return text.text_stats(cat["documents"])


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang × heuristic guess."""
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"].select("lang", text.lang_id(F.col("text")).alias("guessed"))
    return docs.groupBy("lang", "guessed").agg(F.count(F.lit(1)).alias("n_docs"))


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata, decode-free (pure JVM expressions)."""
    cat = Catalog(spark, sf_dir)
    return multimodal.media_metadata(multimodal.media_from_documents(cat["documents"]))


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode path (deterministic fake decoder,
    real plumbing — the oracle re-derives the fake's arithmetic)."""
    cat = Catalog(spark, sf_dir)
    return multimodal.decode_media(multimodal.media_from_documents(cat["documents"]))


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    decoded = multimodal.decode_media(multimodal.media_from_documents(cat["documents"]))
    return multimodal.frame_sample(decoded, every_n=8)


def q_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of q_events_hourly.  Complete-mode
    bounded replay emits every window, so the result equals the batch
    aggregate and is hash-checked against the same DuckDB oracle."""
    return streaming_events.streaming_hourly_counts(spark, sf_dir)


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[!-/:-@\\[-`{-~]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_TOKS = f"string_split_regex(trim({_NORM}), '\\s+')"
_RAW_TOKS = "string_split_regex(trim(text), '\\s+')"
_EN_STOP = "['the','a','of','and','to','in','is','that']"


def _shingle_cte(n: int = 3) -> str:
    parts = ", ".join(f"t[i + {j}]" for j in range(n))
    return f"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - {n - 1}, 0)),
                               i -> concat_ws(' ', {parts}))) AS shingle
  FROM toks)
"""


def _capped_shingle_cte(cap: int) -> str:
    """Append to ``_shingle_cte``: the hot-shingle df cap (mirror of
    ``dedup.ngram_jaccard_pairs(max_doc_freq=cap)``) — shingles in more
    than ``cap`` docs are dropped from the inverted index AND the size
    denominators, identically in both engines (df is exact in each)."""
    return f"""
shc AS (
  SELECT s.doc_id, s.shingle FROM sh s
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {cap}) keep USING (shingle))
"""


def _minhash_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    cross_corpus_mod: int | None = None,
) -> str:
    """``cross_corpus_mod=m`` switches the candidate join from the
    self-pair form (doc_id_1 < doc_id_2) to the train-vs-eval split
    (train = doc_id % m != 0 joined against eval = doc_id % m == 0,
    output columns train_doc_id/eval_doc_id) — the oracle twin of
    ``dedup.minhash_cross_corpus_pairs``."""
    r = num_hashes // bands
    # mirror of dedup.minhash_signatures: k INDEPENDENT salted md5s
    # (h_i = int(md5(f"{i}|{s}")[:15], 16), the _portable_hash scheme) —
    # never the correlated double-hashed derivation, see the operator
    # docstring for the two measured failures it caused
    hash_cols = ", ".join(
        f"min(CAST(('0x' || substr(md5('{i}|' || shingle), 1, 15)) AS BIGINT)) AS mh{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {cols} FROM sig".format(
            b=b,
            cols=", ".join(f"mh{b * r + j} AS b{j}" for j in range(r)),
        )
        for b in range(bands)
    )
    band_key = " AND ".join(["a.band = c.band"] + [f"a.b{j} = c.b{j}" for j in range(r)])
    if cross_corpus_mod is None:
        pair_pred = "a.doc_id < c.doc_id"
        c1, c2 = "doc_id_1", "doc_id_2"
    else:
        m = int(cross_corpus_mod)
        pair_pred = f"a.doc_id % {m} <> 0 AND c.doc_id % {m} = 0"
        c1, c2 = "train_doc_id", "eval_doc_id"
    # verification mirrors the operator: TRUE Jaccard over shingle sets
    # (never a signature-agreement estimate — see dedup.minhash_lsh_pairs)
    return f"""
WITH {_shingle_cte(3)},
sig AS (SELECT doc_id, {hash_cols} FROM sh GROUP BY doc_id),
bandrows AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS {c1}, c.doc_id AS {c2}
  FROM bandrows a JOIN bandrows c ON {band_key}
  WHERE {pair_pred}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT cand.{c1}, cand.{c2}, count(*) AS shared
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.{c1}
  JOIN sh sb ON sb.doc_id = cand.{c2} AND sb.shingle = sa.shingle
  GROUP BY 1, 2)
SELECT {c1}, {c2},
       round(shared * 1.0 / (n1.n_sh + n2.n_sh - shared), 6) AS jaccard
FROM shared
JOIN sizes n1 ON {c1} = n1.doc_id
JOIN sizes n2 ON {c2} = n2.doc_id
WHERE shared * 1.0 / (n1.n_sh + n2.n_sh - shared) >= {threshold}
"""


def _simhash_oracle(bits: int = 64) -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (CAST(('0x' || substr(md5('0|' || tok), 1, 15)) AS BIGINT) >> {b}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    bitstr = " || ".join(f"CASE WHEN s{b} > 0 THEN '1' ELSE '0' END" for b in range(bits))
    return f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
SELECT doc_id, {bitstr} AS simhash_bits FROM sums
"""


def _srp_near_dup_oracle(
    threshold: float = 0.5,
    dim: int = 64,
    n_bands: int = 8,
    planes_per_band: "int | str" = 6,
    seed: int = 42,
) -> str:
    """DuckDB twin of ``similarity.cosine_near_dup_pairs``: regenerates
    the identical md5-seeded SRP planes in SQL (``_plane``'s scheme:
    int(md5(f"{seed}|{plane_id}|{i}")[:8], 16) / 2^31 - 1, all exact in
    double), computes per-band bucket ids, and scores only band-bucket
    collisions — candidate-for-candidate the same set as the Spark LSH
    path, no giant plane literals in the SQL text.

    ``planes_per_band="auto"`` mirrors
    ``similarity.auto_planes_per_band`` with a params CTE:
    ``n < 16 → 8`` else ``max(8, floor(log2(n/16)) + 1)`` — the SAME
    IEEE-double log2/floor both engines evaluate (stable: the floor can
    only straddle an integer when n/16 is an exact power of two, where
    log2 is exact).  DuckDB's ``range()`` cannot take lateral column
    arguments, so the plane-id stream is a static 512-id range (plane
    budget for corpora up to 16·2^64) filtered by ``pid < bands·ppb``
    BEFORE any md5 is evaluated."""
    if planes_per_band == "auto":
        params_cte = (
            "params AS (SELECT CASE WHEN count(*) < 16 THEN 8 ELSE "
            "greatest(8, CAST(floor(log2(count(*) / 16.0)) AS INT) + 1) END AS ppb "
            "FROM embeddings)"
        )
        planes_src = f"params, range(512) t(pid), range({dim}) d(i)\n  WHERE pid < {n_bands} * ppb"
    else:
        params_cte = f"params AS (SELECT {int(planes_per_band)} AS ppb)"
        planes_src = f"params, range({n_bands} * {int(planes_per_band)}) t(pid), range({dim}) d(i)"
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
{params_cte},
planes AS (
  SELECT CAST(pid // ppb AS INT) AS band,
         CAST(pid % ppb AS INT) AS p,
         list(CAST(('0x' || substr(md5({seed} || '|' || pid || '|' || i), 1, 8)) AS BIGINT)
              / 2147483648.0 - 1.0 ORDER BY i) AS plane
  FROM {planes_src}
  GROUP BY pid, ppb),
sig AS (
  SELECT n.vec_id, pl.band,
         sum(CASE WHEN list_dot_product(n.v, pl.plane) > 0
                  THEN CAST(pow(2, pl.p) AS BIGINT) ELSE 0 END) AS bucket
  FROM n, planes pl GROUP BY n.vec_id, pl.band),
cand AS (
  SELECT DISTINCT s1.vec_id AS vec_id_1, s2.vec_id AS vec_id_2
  FROM sig s1 JOIN sig s2
    ON s1.band = s2.band AND s1.bucket = s2.bucket AND s1.vec_id < s2.vec_id)
SELECT vec_id_1, vec_id_2,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
FROM cand JOIN n a ON cand.vec_id_1 = a.vec_id JOIN n b ON cand.vec_id_2 = b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {threshold}
"""


def _lang_scores_sql() -> dict[str, str]:
    out = {}
    for lang, words in text.STOPWORDS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        out[lang] = (
            f"round(len(list_filter({_RAW_TOKS}, t -> list_contains({lst}, t)))"
            f" * 1.0 / len({_RAW_TOKS}), 6)"
        )
    return out


def _lang_id_sql() -> str:
    scores = _lang_scores_sql()
    langs = sorted(scores)
    expr = f"'{langs[0]}'"
    best = scores[langs[0]]
    for lang in langs[1:]:
        expr = f"CASE WHEN {scores[lang]} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({best}, {scores[lang]})"
    return expr


def ext_queries() -> dict:
    return {
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "window_rank_running": q_window_rank_running,
        "set_ops": q_set_ops,
        "scalar_functions": q_scalar_functions,
        "date_functions": q_date_functions,
        "json_extract_events": q_json_extract_events,
        "events_hourly": q_events_hourly,
        "sessionize": q_sessionize,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_srp_bucketed": q_ann_srp_bucketed,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "multimodal_metadata": q_multimodal_metadata,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "streaming_hourly": q_streaming_hourly,
    }


def ext_oracles() -> dict:
    scores = _lang_scores_sql()
    return {
        "agg_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "join_revenue_by_nation": """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "window_rank_running": """
SELECT o_orderkey, o_custkey,
       row_number() OVER w AS rnk,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
        "set_ops": """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM with_orders)
UNION ALL
SELECT 'except', c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM with_orders)
UNION ALL
SELECT 'union', c_custkey FROM (SELECT * FROM building UNION SELECT * FROM with_orders)
""",
        "scalar_functions": """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substr(p_type, 1, 3) AS type_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       p_size % 5 AS size_mod5,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       round(ln(p_retailprice + 1.0), 6) AS price_ln,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor
FROM part
""",
        "date_functions": """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch0
FROM orders
""",
        "json_extract_events": """
SELECT event_type,
       count(*) AS n,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
""",
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
        "sessionize": """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id
""",
        "dedup_exact": f"""
SELECT md5({_NORM}) AS fp, min(doc_id) AS keeper_doc_id, count(*) AS group_size
FROM documents GROUP BY 1
""",
        "dedup_ngram_jaccard": f"""
WITH {_shingle_cte(3)},
{_capped_shingle_cte(NGRAM_MAX_DOC_FREQ)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS shared
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_id_1, doc_id_2,
       round(shared * 1.0 / (n1.n_sh + n2.n_sh - shared), 6) AS jaccard
FROM shared
JOIN sizes n1 ON doc_id_1 = n1.doc_id
JOIN sizes n2 ON doc_id_2 = n2.doc_id
WHERE shared * 1.0 / (n1.n_sh + n2.n_sh - shared) >= 0.8
""",
        "dedup_minhash_lsh": _minhash_oracle(16, 4, 0.5),
        "dedup_simhash": _simhash_oracle(64),
        "dedup_embedding_cosine": _srp_near_dup_oracle(
            threshold=0.4, dim=64, n_bands=8, planes_per_band="auto", seed=42
        ),
        "ann_cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS e,
                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
           FROM embeddings WHERE vec_id % 10 = 0),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
  FROM c, q WHERE c.neighbor_id <> q.query_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
""",
        "ann_srp_bucketed": None,  # plane literals live Spark-side; rows-only
        "text_stats": f"""
SELECT doc_id, lang,
       len({_RAW_TOKS}) AS n_tokens,
       length(text) AS n_chars_measured,
       round(length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / len({_RAW_TOKS}), 6) AS mean_token_len,
       round(len(list_filter({_RAW_TOKS}, t -> list_contains({_EN_STOP}, t))) * 1.0
             / len({_RAW_TOKS}), 6) AS en_stopword_ratio,
       round((least(len({_RAW_TOKS}) / 100.0, 1.0)
             + least(len(list_filter({_RAW_TOKS}, t -> list_contains({_EN_STOP}, t))) * 1.0
                     / len({_RAW_TOKS}) * 5.0, 1.0)
             + greatest(0.0, 1.0 - ((length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                                     * 1.0 / length(text)) * 4.0)) / 3.0, 6) AS quality,
       md5({_NORM}) AS fp
FROM documents
""",
        "lang_id": f"""
SELECT lang, {_lang_id_sql()} AS guessed, count(*) AS n_docs
FROM documents GROUP BY 1, 2
""",
        "multimodal_metadata": """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS byte_len,
       sha256(text) AS content_sha256
FROM documents
""",
        "multimodal_decode": """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS byte_len,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 WHEN doc_id % 3 = 1 THEN 0 ELSE 24 END AS INT) AS n_frames
FROM documents
""",
        "multimodal_frame_sample": """
SELECT doc_id AS media_id, CAST(unnest(generate_series(0, 23, 8)) AS INT) AS frame_idx
FROM documents WHERE doc_id % 3 = 2
""",
        "streaming_hourly": """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    }
