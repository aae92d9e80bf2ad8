"""Round-10 property tests: the block-broadcast exact self-kNN must be
result-identical to the bounded-broadcast kernel it generalizes, and
the cross-corpus exact-span decontamination must agree with a
brute-force shared-run scan.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _knn_rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"]) for r in df.collect()
    )


def test_cosine_topk_blocked_equals_broadcast_kernel(spark):
    """cosine_topk_blocked(corpus) == cosine_topk(corpus, corpus) on the
    sf0.001 embeddings — same ids, same rounded scores, same ranks —
    with block_size forced small enough (64 → 8 blocks of ~63 vectors)
    that the grid path, block replication, and cross-block global
    window are all genuinely exercised."""
    from rdbms_subsetter_spark.catalog import Catalog
    from rdbms_subsetter_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_blocked,
    )

    emb = Catalog(spark, SF_SMALL)["embeddings"]
    want = _knn_rows(cosine_topk(emb, emb, k=3))
    got = _knn_rows(cosine_topk_blocked(emb, k=3, block_size=64))
    assert got == want


def test_cosine_topk_blocked_single_block_degenerate(spark):
    """block_size ≥ n collapses to one block (B=1): the grid is a
    single row and the kernel is a plain self-product — still exact."""
    from rdbms_subsetter_spark.catalog import Catalog
    from rdbms_subsetter_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_blocked,
    )

    emb = Catalog(spark, SF_SMALL)["embeddings"].filter(F.col("vec_id") < 40)
    want = _knn_rows(cosine_topk(emb, emb, k=2))
    got = _knn_rows(cosine_topk_blocked(emb, k=2, block_size=10_000))
    assert got == want


def test_cosine_topk_blocked_empty_corpus(spark):
    from rdbms_subsetter_spark.catalog import Catalog
    from rdbms_subsetter_spark.operators.similarity import cosine_topk_blocked

    emb = Catalog(spark, SF_SMALL)["embeddings"].filter(F.col("vec_id") < 0)
    assert cosine_topk_blocked(emb, k=3).count() == 0


def test_substring_decontaminate_equals_bruteforce(spark):
    """substring_decontaminate_pairs == brute-force longest shared
    token run over every train×eval pair (eval = doc_id % 10 == 0) on a
    corpus with planted spans: a verbatim 9-token eval quote inside a
    train doc (must hit, span 9), an 8-token shared run (boundary,
    must hit), a 7-token run (below min_len, must miss), and a
    train×train / eval×eval duplicate (wrong side of the split, must
    miss)."""
    from rdbms_subsetter_spark.operators.dedup import (
        substring_decontaminate_pairs,
    )

    quote9 = " ".join(f"q{i}" for i in range(9))
    run8 = " ".join(f"r{i}" for i in range(8))
    run7 = " ".join(f"s{i}" for i in range(7))
    filler = lambda j: " ".join(f"f{j}x{i}" for i in range(10))
    docs_rows = [
        (10, f"{quote9} {filler(1)}"),            # eval: the quoted question
        (1, f"{filler(2)} {quote9}"),             # train: quotes it (span 9)
        (20, f"{run8} {filler(3)}"),              # eval
        (2, f"{filler(4)} {run8} {filler(5)}"),   # train (span 8, boundary)
        (30, f"{run7} {filler(6)}"),              # eval
        (3, f"{filler(7)} {run7}"),               # train (span 7 < 8: miss)
        (4, f"{filler(8)} shared train only"),    # train×train dup with 5
        (5, f"{filler(8)} shared train only"),
        (40, f"{filler(9)} shared eval only"),    # eval×eval dup with 50
        (50, f"{filler(9)} shared eval only"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    got = sorted(
        (r["train_doc_id"], r["eval_doc_id"], r["span_len"])
        for r in substring_decontaminate_pairs(docs, min_len=8).collect()
    )
    assert got == [(1, 10, 9), (2, 20, 8)]

    # brute-force cross-check of the same result
    def runs(a, b):
        best = 0
        ta, tb = a.split(), b.split()
        for i in range(len(ta)):
            for j in range(len(tb)):
                k = 0
                while i + k < len(ta) and j + k < len(tb) and ta[i + k] == tb[j + k]:
                    k += 1
                best = max(best, k)
        return best

    texts = dict(docs_rows)
    brute = sorted(
        (t, e, runs(texts[t], texts[e]))
        for t in texts
        for e in texts
        if t % 10 != 0 and e % 10 == 0 and runs(texts[t], texts[e]) >= 8
    )
    assert got == brute


def test_substring_decontaminate_cap_drops_universal_boilerplate(spark):
    """The max_run_freq valve on the cross-corpus operator: a footer
    shared by EVERY doc must not pair every train doc with every eval
    doc (Σ_cls train-df·eval-df goes quadratic), while a genuine
    quote that only two docs share must survive."""
    from rdbms_subsetter_spark.operators.dedup import (
        substring_decontaminate_pairs,
    )

    footer = " ".join(f"lic{i}" for i in range(10))
    quote = " ".join(f"quo{i}" for i in range(9))
    rows = []
    for j in range(40):
        body = " ".join(f"b{j:03d}x{i:02d}" for i in range(12))
        lead = f"{quote} " if j in (1, 10) else ""  # 1=train, 10=eval
        rows.append((j, f"{lead}{body} {footer}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = substring_decontaminate_pairs(docs, min_len=8).count()
    assert uncapped == 36 * 4  # every train×eval pair via the footer

    capped = substring_decontaminate_pairs(docs, min_len=8, max_run_freq=16)
    got = sorted(
        (r["train_doc_id"], r["eval_doc_id"], r["span_len"]) for r in capped.collect()
    )
    # the cap gates CANDIDATES only; the verify stage still reports the
    # true longest shared run for surviving pairs — here the 10-token
    # footer, not the 9-token quote that made the pair survive
    assert got == [(1, 10, 10)]
