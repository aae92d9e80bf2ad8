"""Fleet-wide guard for the driver's canonicalizer: every graded query
must emit only flat, pandas-hashable columns.

The r01 grading failure (`map_functions`: "unhashable type: 'list'")
came from an array-valued output column — the driver canonicalizes
results through pandas sort/factorize, which requires hashable cells.
Arrays/maps/structs must be serialized (array_join / md5 / to_json) at
the query boundary.  This test fails the build the moment any query
regresses to a complex output type.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from tests.conftest import SF_SMALL


def _all_queries():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.queries().items())


@pytest.mark.parametrize(
    "name,fn", _all_queries(), ids=lambda x: x if isinstance(x, str) else ""
)
def test_output_schema_is_flat(name, fn, spark):
    df = fn(spark, SF_SMALL)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} — the driver's pandas "
        "canonicalizer cannot hash these; serialize at the query boundary"
    )
