"""End-to-end CLI test: the reference's EP1 surface
(``rdbms-subsetter SRC DEST FRACTION [flags]``) over parquet dirs.
Runs in-process (same JVM) via ``cli.main``.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rdbms_subsetter_spark.cli import main, parse_force
from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.closure import ClosureEngine
from tests.conftest import SF_SMALL


def test_parse_force_forms():
    assert parse_force("orders:42") == ("orders", None, "42")
    assert parse_force("customer:c_custkey=7") == ("customer", "c_custkey", "7")
    with pytest.raises(ValueError):
        parse_force("orders")


def test_cli_end_to_end(spark, tmp_path, capsys):
    dest = str(tmp_path / "subset")
    rc = main(
        [
            SF_SMALL,
            dest,
            "0.1",
            "--yes",
            "--seed", "7",
            "--children", "2",
            "--force", "orders:1",
            "--full-tables", "region", "nation",
            "--exclude-tables", "documents", "embeddings", "events",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "integrity: all FK edges resolve" in out

    cat = Catalog(spark, dest)
    got = set(cat.tables())
    assert "documents" not in got and "events" not in got
    assert cat.count("region") == 5 and cat.count("nation") == 25  # full tables
    # forced row present with closure
    assert cat["orders"].filter(F.col("o_orderkey") == 1).count() == 1
    # written subset is referentially closed
    eng = ClosureEngine(cat)
    viol = eng.integrity_violations(
        {t: cat[t] for t in got if t in cat.registry.tables()}
    )
    assert all(v == 0 for v in viol.values())


def test_cli_config_merge(spark, tmp_path):
    cfg = tmp_path / "constraints.json"
    cfg.write_text(
        json.dumps(
            {
                "primary_keys": {},
                "constraints": [
                    {
                        "table": "events",
                        "constrained_columns": ["user_id"],
                        "referred_table": "customer",
                        "referred_columns": ["c_custkey"],
                    }
                ],
            }
        )
    )
    dest = str(tmp_path / "subset2")
    rc = main(
        [SF_SMALL, dest, "0.05", "--yes", "--config", str(cfg),
         "--exclude-tables", "documents", "embeddings"]
    )
    assert rc == 0
    cat = Catalog(spark, dest)
    # every selected event's user resolves to a selected customer
    ev_users = cat["events"].select(F.col("user_id").alias("c_custkey")).na.drop()
    missing = ev_users.join(cat["customer"], on="c_custkey", how="left_anti")
    assert missing.count() == 0
