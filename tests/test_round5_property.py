"""Round-5 property tests: the two graded operator families that until
now were verified only against DuckDB oracles on fixed datasets get
independent references on ARBITRARY data — the as-of join against
pandas.merge_asof (a third-party implementation of the same semantics)
and the winnowing fingerprint against a pure-Python replica of its
md5/bottom-k math.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# -- as-of join vs pandas.merge_asof ----------------------------------------

_asof_case = st.tuples(
    # left rows: (key, ts)
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=25,
    ),
    # right rows: (key, ts, payload) — ts deduped per key below, since
    # without a tiebreak equal-ts right rows make the winner unspecified
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=25,
    ),
    st.booleans(),  # strict
)


@SLOW
@given(case=_asof_case)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows, strict = case
    right_dedup = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())
    lpdf = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["lid", "k", "ts"],
    )
    rpdf = pd.DataFrame(right_dedup, columns=["k", "rts", "rv"])

    from rdbms_subsetter_spark.operators.joins import asof_join

    left = spark.createDataFrame(lpdf, "lid long, k long, ts long")
    right = (
        spark.createDataFrame(rpdf, "k long, rts long, rv long")
        if len(rpdf)
        else spark.createDataFrame([], "k long, rts long, rv long")
    )
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, on=[("k", "k")], left_ts="ts", right_ts="rts",
            payload=["rv"], strict=strict,
        ).collect()
    }

    if len(rpdf):
        merged = pd.merge_asof(
            lpdf.sort_values(["ts", "lid"]),
            rpdf.sort_values("rts"),
            left_on="ts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=not strict,
        )
        want = {
            int(row.lid): (None if pd.isna(row.rv) else int(row.rv))
            for row in merged.itertuples()
        }
    else:
        want = {int(row.lid): None for row in lpdf.itertuples()}
    assert got == want


# -- winnowing fingerprint vs pure-python replica ----------------------------

_WORD = st.text(
    alphabet="ab1.!xyz",  # letters, a digit, punctuation the normalizer strips
    min_size=1,
    max_size=4,
)
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


def _py_winnow(text: str, n: int = 3, k: int = 4):
    """Pure-python replica of operators/text.normalize + dedup.shingles
    + dedup.winnow_fingerprints: lowercase, strip ASCII punctuation,
    collapse whitespace, distinct word n-grams, md5[:15 hex] as long,
    (count, min, sorted bottom-k)."""
    t = text.lower()
    t = re.sub(r"[!-/:-@\[-`{-~]", " ", t)
    t = re.sub(r"\s+", " ", t).strip()
    toks = t.split(" ")  # "" -> [""], matching Spark's split(trim(x))
    if len(toks) < n:
        return None
    sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    hs = sorted(int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh)
    return (len(hs), hs[0], hs[:k])


@SLOW
@given(docs=st.lists(_DOC, min_size=1, max_size=8))
def test_winnow_fingerprints_match_python_reference(spark, docs):
    from rdbms_subsetter_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["min_hash"], list(r["bottom_k"]))
        for r in winnow_fingerprints(df, n=3, k=4).collect()
    }
    want = {}
    for i, d in enumerate(docs):
        ref = _py_winnow(d, n=3, k=4)
        if ref is not None:
            want[i] = (ref[0], ref[1], ref[2])
    assert got == want
