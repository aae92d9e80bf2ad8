"""Replicates the driver's t2 gate locally: every ``queries()`` entry is
run on Spark and its ``oracle_sql()`` twin on DuckDB, then compared
row-count + column-names + order-insensitive values.

Runs at sf0.001 by default (fast); set PARITY_SF=/root/testdata/sf0.01
to mirror the driver's exact scale.
"""

from __future__ import annotations

import math
import os

import pytest

from tests.conftest import SF_SMALL, register_views

SF_DIR = os.environ.get("PARITY_SF", SF_SMALL)


def _normalize(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (floats via repr after round-trip, timestamps via isoformat)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # collapse -0.0/0.0 and trailing float noise is already
            # handled query-side by round(); repr keeps full precision
            return repr(v + 0.0)
        if isinstance(v, bool):
            return str(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, list):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def _pairs():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return qs, oracles


QUERIES, ORACLES = _pairs()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = QUERIES[name]
    df = fn(spark, SF_DIR)
    spark_rows = df.collect()
    spark_cols = df.columns
    assert len(spark_cols) == len(set(spark_cols)), f"duplicate column names in {name}"

    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible): schema is stable and
        # the query executes; emptiness is allowed only for pair-finders
        assert spark_rows is not None
        return

    register_views(duck, SF_DIR)
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sn = _normalize([tuple(r) for r in spark_rows], spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_arrow_types_hashable(name, duck):
    """Driver-hash guard: the oracle's Arrow schema must not contain
    decimal128 columns.  DuckDB types SUM(<integer>) as HUGEINT ->
    Arrow decimal128(38,0) while Spark emits int64; the grading driver
    canonicalizes Decimal("61") != 61 and fails the hash even when the
    values are identical (root cause of all 10 red CORRECTNESS_r02 rows).
    Every integer SUM in oracle SQL must be wrapped CAST(... AS BIGINT).
    """
    register_views(duck, SF_DIR)
    tbl = duck.execute(ORACLES[name]).arrow()
    offenders = [
        f"{f.name}:{f.type}" for f in tbl.schema if "decimal" in str(f.type)
    ]
    assert not offenders, (
        f"{name}: oracle emits Arrow decimal columns {offenders}; "
        f"wrap integer SUMs with CAST(... AS BIGINT)"
    )
