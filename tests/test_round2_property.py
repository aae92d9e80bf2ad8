"""Property tests for the round-2 operators: split assignment
(partition + determinism + group cohesion), containment pairs against a
brute-force Python oracle, and PCA against numpy on arbitrary matrices.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from rdbms_subsetter_spark.partitioning import split_assignment

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60, unique=True),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_split_assignment_partitions_and_is_deterministic(spark, ids, seed):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out1 = {r["doc_id"]: r["split"] for r in split_assignment(df, "doc_id", seed).collect()}
    out2 = {r["doc_id"]: r["split"] for r in split_assignment(df, "doc_id", seed).collect()}
    assert out1 == out2  # deterministic
    assert set(out1) == set(ids)  # total
    assert set(out1.values()) <= {"train", "valid", "test"}


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        ),
        min_size=1,
        max_size=60,
    ),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_group_split_keeps_groups_whole(spark, rows, seed):
    df = spark.createDataFrame(
        [(i, g) for i, (i2, g) in enumerate(rows) for _ in [i2]], "doc_id long, source string"
    )
    out = split_assignment(df, "source", seed)
    leaky = (
        out.groupBy("source")
        .agg(F.count_distinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert leaky == 0


@SLOW
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=12
        ),
        min_size=2,
        max_size=10,
    )
)
def test_containment_matches_bruteforce(spark, docs):
    from rdbms_subsetter_spark.operators.dedup import ngram_containment_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in ngram_containment_pairs(df, n=3, threshold=0.5).collect()
    }

    def sh(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i, a in enumerate(docs):
        for j, b in enumerate(docs):
            if i == j or not sh(a):
                continue
            c = round(len(sh(a) & sh(b)) / len(sh(a)), 6)
            if c >= 0.5 and len(sh(a) & sh(b)) > 0:
                want[(i, j)] = c
    assert got == want


@SLOW
@given(
    data=st.integers(min_value=0, max_value=2**32 - 1),
    n=st.integers(min_value=5, max_value=40),
    d=st.integers(min_value=2, max_value=6),
)
def test_pca_property_matches_numpy(spark, data, n, d):
    from rdbms_subsetter_spark.operators.similarity import pca_fit_project

    rng = np.random.default_rng(data)
    mat = rng.normal(size=(n, d))
    df = spark.createDataFrame(
        [(i, 0, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, label int, embedding array<float>",
    )
    got = {r["vec_id"]: r["pc1"] for r in pca_fit_project(df, n_components=1).collect()}

    m32 = mat.astype(np.float32).astype(np.float64)  # operator sees float32 data
    mean = m32.mean(axis=0)
    cov = np.cov(m32, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    v = vecs[:, np.argmax(vals)]
    if v[np.abs(v).argmax()] < 0:
        v = -v
    want = (m32 - mean) @ v
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-3
