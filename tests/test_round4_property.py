"""Property tests for the round-4 operators: sketch accuracy contracts
on arbitrary data (not just the fixed testdata) and SRP top-k
consistency against the brute-force kernel on random vector sets.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=500), min_size=20, max_size=300
    ),
)
def test_sketch_hard_guarantees_hold_on_arbitrary_data(spark, vals):
    """Only the sketches' HARD guarantees are property-testable: the
    quantile sketch's rank-error bound is deterministic worst-case
    (Greenwald-Khanna), so the p ± 2/acc bracket from a 2×-finer
    sketch must hold on ANY input, and both sketches must be
    deterministic (same input → same estimate).

    Deliberately NOT asserted here: a fixed accuracy bound for
    approx_count_distinct.  HLL++'s rsd is a standard deviation, not a
    worst-case bound — hypothesis finds hash-collision value sets where
    5 distinct longs estimate as 3 (40% error), so any fixed bound is
    falsifiable by adversarial search.  The 5·rsd accuracy claim is
    checked where it is meaningful: on the FIXED gate datasets
    (agg_sketch_error_bounds at three scales), where the deterministic
    estimate is verified in-bound."""
    acc = 10_000
    eps = 2.0 / acc
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    agg = df.agg(
        F.approx_count_distinct("x", rsd=0.02).alias("approx"),
        F.percentile_approx("x", 0.5, acc).alias("a_med"),
        F.percentile_approx("x", 0.5 - eps, 2 * acc).alias("lo"),
        F.percentile_approx("x", 0.5 + eps, 2 * acc).alias("hi"),
    )
    r1 = agg.collect()[0]
    r2 = agg.collect()[0]
    assert r1 == r2  # sketches are deterministic
    assert r1["lo"] <= r1["a_med"] <= r1["hi"], r1  # hard rank bound
    assert r1["approx"] >= 1  # sanity: non-degenerate estimate


@SLOW
@given(
    data=st.data(),
    n=st.integers(min_value=6, max_value=24),
    d=st.integers(min_value=3, max_value=6),
)
def test_srp_results_are_bucket_consistent_bruteforce_pairs(spark, data, n, d):
    """Every (query, neighbor) pair srp_topk emits must (a) share the
    deterministic SRP bucket, (b) carry the exact brute-force cosine
    for that pair, and (c) be the top-k BY that cosine among the
    query's same-bucket candidates — i.e. the approximation only ever
    restricts the candidate set, never alters scores or ordering."""
    from rdbms_subsetter_spark.operators.similarity import srp_topk
    from tools.fixture_expectations import srp_expect  # noqa: F401  (shape ref)

    import hashlib

    raw = [
        [
            data.draw(
                st.floats(
                    min_value=-8, max_value=8, allow_nan=False, width=32
                )
            )
            for _ in range(d)
        ]
        for _ in range(n)
    ]
    # drop all-zero vectors (undefined cosine)
    rows = [(i, v) for i, v in enumerate(raw) if any(abs(x) > 1e-3 for x in v)]
    if len(rows) < 3:
        return
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") % 3 == 0)
    got = srp_topk(emb, queries, dim=d, k=2, n_planes=2, seed=7).collect()

    # python mirror of signature + cosine (float32 ingest, left folds)
    def plane(pid):
        return [
            int(hashlib.md5(f"7|{pid}|{i}".encode()).hexdigest()[:8], 16)
            / float(2**31)
            - 1.0
            for i in range(d)
        ]

    def fold(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    vecs = {i: [float(np.float32(x)) for x in v] for i, v in rows}
    planes = [plane(p) for p in range(2)]
    sig = {
        i: sum(2**p for p in range(2) if fold(v, planes[p]) > 0)
        for i, v in vecs.items()
    }
    nrm = {i: float(np.sqrt(fold(v, v))) for i, v in vecs.items()}

    def cos(a, b):
        return round(fold(vecs[a], vecs[b]) / (nrm[a] * nrm[b]), 6)

    by_q: dict = {}
    for r in got:
        q, nb = r["query_id"], r["neighbor_id"]
        assert sig[q] == sig[nb], (q, nb)                      # (a)
        assert r["cosine"] == cos(q, nb), (q, nb, r["cosine"])  # (b)
        by_q.setdefault(q, []).append((r["rank"], nb, r["cosine"]))
    for q, res in by_q.items():
        cands = sorted(
            ((-cos(q, j), j) for j in vecs if j != q and sig[j] == sig[q]),
        )[:2]
        want = [(rk, j, -negc) for rk, (negc, j) in enumerate(cands, start=1)]
        assert sorted(res) == want, (q, sorted(res), want)      # (c)
