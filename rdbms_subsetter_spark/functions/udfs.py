"""The Python-UDF surface, used ONLY where column expressions can't
express the computation (SURVEY.md §2B "UDFs are the slow path").

Every entry here is Arrow-batched (grouped ``applyInPandas`` / Spark 4
``udtf``) — never row-at-a-time ``F.udf``.  Both examples are
deterministic and therefore DuckDB-oracle-checkable, which is the point:
the UDF *plumbing* (Arrow schemas, grouped dispatch, lateral expansion)
is what these exercise, on computations whose answers SQL can verify.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import DataFrame, functions as F


def grouped_zscore(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score normalization via grouped ``applyInPandas``
    (each group arrives as one pandas DataFrame over Arrow).

    Population stddev, matching SQL ``(x - avg) / stddev_pop``; groups
    with zero variance emit NULL.  At scale: one shuffle on the group
    key — identical to the window-function formulation, but the pandas
    form generalizes to sklearn-style per-group model application.
    """
    import numpy as np

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def norm(pdf):
        v = pdf[value_col].to_numpy(dtype=np.float64)
        sd = v.std()  # population (ddof=0)
        # no np.round here: numpy rounds half-even, SQL half-up —
        # callers round JVM-side so both engines round identically
        pdf[out_col] = (v - v.mean()) / sd if sd > 0 else np.nan
        return pdf

    return df.groupBy(group_col).applyInPandas(norm, schema=out_schema)


def sentence_split_udtf(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode each document into (sentence_idx, sentence) rows with a
    Python UDTF (Spark 4 ``@udtf``) — the table-function surface.

    Splitting on '.' with whitespace trim, dropping empties: trivially
    mirrored in SQL, so the UDTF machinery itself is what the oracle
    checks.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="sentence_idx int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id, text):  # noqa: ANN001
            idx = 0
            for raw in (text or "").split("."):
                s = raw.strip(" \t\n\r")  # explicit set, mirrored in the oracle
                if s:
                    idx += 1
                    yield idx, s

    # lateral-join form: one UDTF call per document row
    return docs.lateralJoin(
        SentenceSplit(F.col("doc_id").outer(), F.col(text_col).outer())
    ).select("doc_id", "sentence_idx", "sentence")


def horner_cubic() -> "F.Column":
    """Scalar ``pandas_udf`` (vectorized Arrow batches): the cubic
    ((x·0.25 + 1.5)·x − 2)·x in Horner form.

    The third UDF shape alongside grouped ``applyInPandas`` and the
    UDTF: a SCALAR Arrow UDF — batches arrive as ``pandas.Series``, the
    whole batch is computed in one numpy call, no per-row Python.  Pure
    IEEE-754 arithmetic (no libm transcendentals, which differ in the
    last ulp between numpy and other engines), so DuckDB verifies the
    Arrow plumbing bit-exactly (``round()`` happens JVM-side in the
    caller, never in numpy).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _horner_cubic(v: pd.Series) -> pd.Series:
        x = v.to_numpy(dtype=np.float64)
        return pd.Series(((x * 0.25 + 1.5) * x - 2.0) * x)

    return _horner_cubic
