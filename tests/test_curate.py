"""End-to-end tests for the curation pipeline CLI (curate.py) — the
training-data twin of test_cli.py's subset coverage.

Invariants checked against the written output, not the in-memory frame:
funnel monotonicity, no duplicate fingerprints after exact dedup,
split completeness/disjointness, group-split leakage safety, and
deterministic reruns.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rdbms_subsetter_spark.curate import curate
from rdbms_subsetter_spark.operators.text import fingerprint
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    dest = tmp_path_factory.mktemp("curated")
    report = curate(spark, SF_SMALL, str(dest), dedup_method="exact", shards=4)
    out = spark.read.parquet(report["dest"])
    return report, out


def test_funnel_monotone_and_consistent(curated):
    report, out = curated
    assert (
        report["n_total"]
        >= report["n_pass_lang"]
        >= report["n_pass_quality"]
        >= report["n_pass_length"]
        >= report["n_final"]
        > 0
    )
    assert report["n_dedup_removed"] >= 0
    assert out.count() == report["n_final"]
    assert sum(report["per_split"].values()) == report["n_final"]


def test_exact_dedup_holds_in_output(curated, spark):
    _, out = curated
    n_fp = out.select(fingerprint(F.col("text")).alias("fp")).distinct().count()
    assert n_fp == out.count()


def test_splits_partition_the_output(curated):
    _, out = curated
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "valid", "test"}
    # every doc appears exactly once
    assert out.select("doc_id").distinct().count() == out.count()


def test_shard_positions_are_dense_per_split_and_shard(curated):
    # positions must be gap-free within each (split, shard) so a loader
    # reading only split=train sees dense positions (ADVICE r02)
    _, out = curated
    bad = (
        out.groupBy("split", "shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("position").alias("maxp"))
        .where(F.col("n") != F.col("maxp"))
        .count()
    )
    assert bad == 0


def test_rerun_is_deterministic(curated, spark, tmp_path):
    report1, _ = curated
    report2 = curate(spark, SF_SMALL, str(tmp_path), dedup_method="exact", shards=4)
    for k in ("n_total", "n_pass_quality", "n_pass_length", "n_final", "per_split"):
        assert report1[k] == report2[k]


def test_group_split_has_no_source_leakage(spark, tmp_path):
    report = curate(
        spark, SF_SMALL, str(tmp_path), dedup_method="none", group_split=True
    )
    out = spark.read.parquet(report["dest"])
    leaky = (
        out.groupBy("source")
        .agg(F.count_distinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert leaky == 0


def test_minhash_mode_removes_at_least_exact_dupes(spark, tmp_path):
    report = curate(
        spark, SF_SMALL, str(tmp_path), dedup_method="minhash", threshold=0.5
    )
    # near-dup removal is a superset of exact-dup removal
    exact = curate(
        spark, SF_SMALL, str(tmp_path / "e"), dedup_method="exact"
    )
    assert report["n_final"] <= exact["n_final"]


def test_report_is_json_serializable(curated):
    report, _ = curated
    assert json.loads(json.dumps(report)) == report


def test_empty_survivor_set_yields_zero_report(spark, tmp_path):
    report = curate(spark, SF_SMALL, str(tmp_path), min_quality=2.0)
    assert report["n_final"] == 0
    assert report["per_split"] == {}
    assert report["n_dedup_removed"] == 0
