"""End-to-end corpus curation pipeline + CLI — the training-data twin
of the reference's subset CLI (SURVEY.md §3 EP1)::

    python -m rdbms_subsetter_spark.curate SOURCE_DIR DEST_DIR \
        [--langs en] [--min-quality 0.5] [--min-tokens 20] \
        [--max-tokens 100000] [--dedup exact|minhash|none] \
        [--threshold 0.5] [--split-seed 7] [--group-split] \
        [--shards 4] [--report report.json] [-y]

Stages (each one a first-class operator elsewhere in the repo):

1. rule filters  — language + quality score + token band, flags
   computed in ONE scan (operators.text)
2. dedup         — exact fingerprint keep-min, or MinHash-LSH
   candidate pairs → connected components → keep the cluster
   representative (operators.dedup)
3. split         — deterministic md5 train/valid/test, iid (doc_id)
   or leakage-safe by source domain (partitioning.split_assignment)
4. shard         — seeded permutation within the training split
   (partitioning.shard_assignment) so a resumable data loader can
   recompute epoch order from (seed, ids) alone
5. write         — parquet directory-partitioned by split (free
   pruning for loaders) + a JSON funnel report

Scale notes: stages 1/3/4 are pure projections or per-shard window
sorts; stage 2 is the banded-LSH shape (bucket equi-joins, never a
cross product); the only driver-side values are the funnel counters in
the report.  The write is directory-partitioned, so the 100 TB version
of every downstream read prunes to one split.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdbms_subsetter_spark import partitioning
from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.operators import dedup as dd, text


def rule_filter(
    docs: DataFrame,
    langs: list[str],
    min_quality: float,
    min_tokens: int,
    max_tokens: int,
) -> DataFrame:
    """Stage-1 rule filters as cumulative flags in one projection."""
    t = F.col("text")
    return docs.withColumns(
        {
            "_n_tok": text.token_count(t),
            "_quality": text.quality_score(t),
            "_ok_lang": F.col("lang").isin(*langs) if langs else F.lit(True),
        }
    ).withColumns(
        {
            "_ok_quality": F.col("_ok_lang") & (F.col("_quality") >= min_quality),
            "_ok_length": F.col("_n_tok").between(min_tokens, max_tokens),
        }
    )


def dedup_survivors(flagged: DataFrame, method: str, threshold: float) -> DataFrame:
    """Stage-2 dedup over rows that passed the rule filters."""
    passed = flagged.where(F.col("_ok_quality") & F.col("_ok_length"))
    if method == "none":
        return passed
    if method == "exact":
        return dd.drop_exact_duplicates(passed)
    if method == "minhash":
        # exact dedup first (production pipelines always stack it under
        # near-dedup): exact dupes with <3 tokens produce no shingles and
        # would otherwise slip past MinHash-LSH entirely (ADVICE r02)
        passed = dd.drop_exact_duplicates(passed)
        pairs = dd.minhash_lsh_pairs(passed, threshold=threshold)
        clusters = dd.connected_components(pairs)
        drop = clusters.where(F.col("node") != F.col("cluster_id")).select(
            F.col("node").alias("doc_id")
        )
        return passed.join(drop, "doc_id", "left_anti")
    raise ValueError(f"unknown dedup method {method!r}")


def curate(
    spark: SparkSession,
    source: str,
    dest: str,
    langs: list[str] | None = None,
    min_quality: float = 0.5,
    min_tokens: int = 20,
    max_tokens: int = 100000,
    dedup_method: str = "exact",
    threshold: float = 0.5,
    split_seed: int = 7,
    group_split: bool = False,
    shards: int = 4,
) -> dict:
    """Run the full curation pipeline; returns the funnel report dict."""
    t0 = time.perf_counter()
    langs = ["en"] if langs is None else langs
    docs = Catalog(spark, source)["documents"]

    flagged = rule_filter(docs, langs, min_quality, min_tokens, max_tokens)
    funnel = flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("_ok_lang").cast("long")).alias("n_lang"),
        F.sum(F.col("_ok_quality").cast("long")).alias("n_quality"),
        F.sum((F.col("_ok_quality") & F.col("_ok_length")).cast("long")).alias(
            "n_length"
        ),
    ).collect()[0]

    survivors = dedup_survivors(flagged, dedup_method, threshold).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    split_key = "source" if group_split else "doc_id"
    split = partitioning.split_assignment(survivors, split_key, seed=split_seed)
    sharded = partitioning.shard_assignment(
        split, "doc_id", n_shards=shards, within=["split"]
    ).select(
        "doc_id", "text", "lang", "source", "n_chars", "split", "shard", "position"
    )

    out_dir = str(Path(dest) / "documents")
    (
        sharded.repartition("split", "shard")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(out_dir)
    )

    # read the WRITTEN data back for the report (validates the sink);
    # an empty write leaves no part files, so fall back to the frame's
    # schema rather than crashing on schema inference
    written = spark.read.schema(sharded.schema).parquet(out_dir)
    per_split = {
        r["split"]: r["n"]
        for r in written.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_final = sum(per_split.values())
    report = {
        "source": source,
        "dest": out_dir,
        "dedup_method": dedup_method,
        "split_mode": "group_by_source" if group_split else "iid_by_doc_id",
        "n_total": funnel["n_total"],
        "n_pass_lang": funnel["n_lang"],
        "n_pass_quality": funnel["n_quality"],
        "n_pass_length": funnel["n_length"],
        "n_dedup_removed": funnel["n_length"] - n_final,
        "n_final": n_final,
        "per_split": per_split,
        "shards": shards,
        "wall_sec": round(time.perf_counter() - t0, 2),
    }
    return report


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rdbms_subsetter_spark.curate",
        description="Rule-filter, dedup, split and shard a documents corpus.",
    )
    p.add_argument("source", help="source directory of <table>.parquet files")
    p.add_argument("dest", help="destination directory")
    p.add_argument("--langs", nargs="*", default=["en"])
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--max-tokens", type=int, default=100000)
    p.add_argument("--dedup", choices=["exact", "minhash", "none"], default="exact")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="minhash est-jaccard threshold")
    p.add_argument("--split-seed", type=int, default=7)
    p.add_argument("--group-split", action="store_true",
                   help="leakage-safe split by source domain instead of iid")
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--report", help="also write the JSON report here")
    p.add_argument("-y", "--yes", action="store_true", help="skip confirm prompt")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.yes:
        print(
            f"curate {args.source} -> {args.dest} "
            f"(langs={args.langs} q>={args.min_quality} "
            f"tokens=[{args.min_tokens},{args.max_tokens}] dedup={args.dedup} "
            f"split={'group' if args.group_split else 'iid'} shards={args.shards})"
        )
        if input("proceed? [y/N] ").strip().lower() not in {"y", "yes"}:
            print("aborted")
            return 1

    from rdbms_subsetter_spark.session import get_spark

    spark = get_spark("curate")
    report = curate(
        spark,
        args.source,
        args.dest,
        langs=args.langs,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        dedup_method=args.dedup,
        threshold=args.threshold,
        split_seed=args.split_seed,
        group_split=args.group_split,
        shards=args.shards,
    )
    out = json.dumps(report, indent=1, sort_keys=True)
    print(out)
    if args.report:
        Path(args.report).write_text(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
