"""Extension battery 8: Spark 4 surface coverage — VARIANT semi-
structured type, SQL pipe syntax, Arrow-native batch UDFs, and the
transformWithState arbitrary-state API (streaming/events.py).

The reference predates all of these (and computes nothing over values
regardless — SURVEY.md §2A); they matter because a 100 TB pipeline
lives and dies on (a) cheap semi-structured access without a parse per
field, (b) zero-copy batch transforms that skip the pandas detour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_subsetter_spark.catalog import Catalog


def q_json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the Spark 4 VARIANT type: props is
    parsed ONCE into a variant column, then every field access is a
    cheap ``variant_get`` path lookup on the binary encoding — the
    at-scale answer to repeated ``get_json_object`` string re-parses
    (one parse per field per row).  Aggregated per event_type so the
    oracle hash-checks the extracted values, not the opaque variant.

    try_ variants throughout: props is untrusted — under ANSI mode
    ``parse_json`` throws on malformed JSON and ``variant_get`` throws
    INVALID_VARIANT_CAST on a non-numeric k; the try_ forms yield NULL,
    matching the oracle's TRY_CAST, and n_null_k counts exactly those
    rows on both sides."""
    cat = Catalog(spark, sf_dir)
    v = F.try_parse_json(F.col("props"))
    return (
        cat["events"]
        .select(
            "event_type",
            F.try_variant_get(v, "$.k", "bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_if(F.col("k").isNull()).alias("n_null_k"),
        )
    )


_SQL_JSON_VARIANT = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(TRY_CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(TRY_CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(TRY_CAST(props->>'$.k' AS BIGINT)) AS max_k,
       count(*) FILTER (WHERE TRY_CAST(props->>'$.k' AS BIGINT) IS NULL) AS n_null_k
FROM events
GROUP BY event_type
"""


def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>`` operators): the same logical plan
    as the nested-subquery form, written as a linear pipeline —
    scan |> filter |> aggregate |> filter |> order.  Catalyst compiles
    both spellings identically (pushdown, partial aggs); the oracle is
    the plain-SQL twin.

    The source is bound via a scoped, uniquely-named temp view that is
    dropped before returning (the DataFrame holds the resolved plan, not
    the name): registering it as 'orders' would leak a session-global
    view shadowing the catalog table for every later query in the same
    session — stale if sf_dir changes."""
    from rdbms_subsetter_spark.session import stable_suffix

    cat = Catalog(spark, sf_dir)
    view = f"__pipe_orders_{stable_suffix(sf_dir)}"
    cat["orders"].createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            FROM {view}
            |> WHERE o_orderstatus <> 'P'
            |> AGGREGATE count(*) AS n_orders,
                         round(sum(o_totalprice), 2) AS total_price
               GROUP BY o_orderpriority, CAST(year(o_orderdate) AS INT) AS o_year
            |> WHERE n_orders > 5
            """
        )
    finally:
        spark.catalog.dropTempView(view)


_SQL_PIPE_SYNTAX = """
SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS o_year,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY 1, 2
HAVING count(*) > 5
"""


def q_udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy batch transform via ``mapInArrow``: RecordBatches flow
    straight from the scan into pyarrow with NO pandas materialization —
    the cheapest Python hook Spark has, the right one for tight
    numeric kernels over wide batches.  Computes each embedding's
    squared L2 norm with an explicit left-fold accumulation so the
    double matches DuckDB's sequential ``list_dot_product`` exactly."""
    import pyarrow as pa

    cat = Catalog(spark, sf_dir)

    def norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            embs = batch.column("embedding")
            out = []
            for lst in embs.to_pylist():
                acc = 0.0
                for x in lst:
                    acc += float(x) * float(x)
                out.append(acc)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.float64())],
                names=["vec_id", "norm_sq"],
            )

    return (
        cat["embeddings"]
        .select("vec_id", "embedding")
        .mapInArrow(norms, "vec_id long, norm_sq double")
        .select("vec_id", F.round("norm_sq", 6).alias("norm_sq"))
    )


_SQL_MAP_IN_ARROW = """
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[])), 6) AS norm_sq
FROM embeddings
"""


def q_streaming_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming via the Spark 4 transformWithState
    API (StatefulProcessor + typed ValueState) — the successor to
    applyInPandasWithState with composable state variables, timers and
    TTL.  Same per-user running totals as streaming_stateful_totals, so
    the bounded replay is DuckDB-checkable against the batch aggregate.
    Where the env lacks protobuf (the v2 state-server wire format) the
    run falls back to the applyInPandasWithState twin — same contract,
    same oracle (see streaming/events.py)."""
    from rdbms_subsetter_spark.streaming import events as streaming_events

    return streaming_events.streaming_transform_with_state(spark, sf_dir)


_SQL_TRANSFORM_WITH_STATE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY user_id
"""


def q_text_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw line-oriented text connector: documents serialized as
    tab-delimited lines via ``write.text``, read back with
    ``spark.read.text`` and re-split into columns — the on-ramp for
    log-shaped corpora where schema is applied after the fact.  The
    oracle reads the original parquet, so any line-splitting or
    round-trip loss breaks the hash."""
    from rdbms_subsetter_spark.sources.io import text_roundtrip

    cat = Catalog(spark, sf_dir)
    rt = text_roundtrip(
        cat["documents"], ["doc_id", "lang", "n_chars"], tag=f"{sf_dir}/documents"
    )
    return rt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        F.min(F.col("doc_id").cast("long")).alias("min_id"),
        F.max(F.col("doc_id").cast("long")).alias("max_id"),
    )


_SQL_TEXT_SOURCE = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents
GROUP BY lang
"""


def ext8_queries() -> dict:
    return {
        "json_variant_extract": q_json_variant_extract,
        "sql_pipe_syntax": q_sql_pipe_syntax,
        "udf_map_in_arrow": q_udf_map_in_arrow,
        "streaming_transform_with_state": q_streaming_transform_with_state,
        "text_source_agg": q_text_source_agg,
    }


def ext8_oracles() -> dict:
    return {
        "json_variant_extract": _SQL_JSON_VARIANT,
        "sql_pipe_syntax": _SQL_PIPE_SYNTAX,
        "udf_map_in_arrow": _SQL_MAP_IN_ARROW,
        "streaming_transform_with_state": _SQL_TRANSFORM_WITH_STATE,
        "text_source_agg": _SQL_TEXT_SOURCE,
    }
