"""Independent derivations of the literal-fixture oracle values in
``queries_ext14`` (graph_pagerank_fixture, dedup_semdedup_fixture).

Run ``python tools/fixture_expectations.py`` to re-derive and print the
expected tables; neither derivation touches the Spark operators, so the
oracles are implementation-independent (numpy power iteration and a
brute-force float32-cosine mirror of the SemDeDup keep rule).  The only
shared piece is ``_lloyd_kmeans`` for cell ASSIGNMENT (the fixture
grades the keep rule given the cells; kmeans determinism itself is
covered by unit tests).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def pagerank_expect() -> list[tuple[int, float]]:
    from rdbms_subsetter_spark.queries_ext14 import _PR_EDGES

    n = 5
    A = np.zeros((n, n))
    for s, d in _PR_EDGES:
        A[d, s] = 1.0
    outdeg = A.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        contrib = np.zeros(n)
        dangling = 0.0
        for s in range(n):
            if outdeg[s] == 0:
                dangling += r[s]
            else:
                contrib += A[:, s] * (r[s] / outdeg[s])
        r = (0.15 + 0.85 * dangling) / n + 0.85 * contrib
    return [(i, round(float(v), 8)) for i, v in enumerate(r)]


def semdedup_expect() -> list[tuple[int, int, int]]:
    from rdbms_subsetter_spark.operators.similarity import _lloyd_kmeans
    from rdbms_subsetter_spark.queries_ext14 import _SD_VECS

    ids = np.array([i for i, _ in _SD_VECS])
    mat = np.array([v for _, v in _SD_VECS], dtype=np.float64)
    centers = _lloyd_kmeans(mat, k=3, iters=10, seed=42)
    cells = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    # the operator ships unit vectors as float32 over Arrow; mirror that
    normed = (
        (mat / np.linalg.norm(mat, axis=1, keepdims=True))
        .astype(np.float32)
        .astype(np.float64)
    )
    out = []
    for c in sorted(np.unique(cells)):
        m = cells == c
        cid, cv = ids[m], normed[m]
        cos = cv @ cv.T
        dropped: set[int] = set()
        order = np.argsort(cid)
        for bi in order:
            for ai in order:
                if cid[ai] >= cid[bi]:
                    break
                if cos[ai, bi] >= 0.95:
                    dropped.add(int(cid[bi]))
                    break
        out.append((int(c), int(m.sum()), int(m.sum()) - len(dropped)))
    return out


def ivf_expect() -> list[tuple[int, int, float, int]]:
    """Brute-force 2-NN of queries {0,4,8} over the fixture corpus:
    float32-truncated unit vectors scored with a strict left-to-right
    float64 fold — the same IEEE operation sequence as the operator's
    ``dot`` column, so agreement is bit-exact, not approximate."""
    from rdbms_subsetter_spark.queries_ext14 import _SD_VECS

    ids = [i for i, _ in _SD_VECS]
    mat = np.array([v for _, v in _SD_VECS], dtype=np.float64)
    unit = (
        (mat / np.linalg.norm(mat, axis=1, keepdims=True))
        .astype(np.float32)
        .astype(np.float64)
    )

    def leftfold(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    rows = []
    for q in (0, 4, 8):
        qi = ids.index(q)
        cands = sorted(
            (-round(leftfold(unit[qi], unit[j]), 6), nid)
            for j, nid in enumerate(ids)
            if nid != q
        )
        for rk, (negc, nid) in enumerate(cands[:2], start=1):
            rows.append((q, nid, -negc, rk))
    return rows


if __name__ == "__main__":
    print("pagerank:", pagerank_expect())
    print("semdedup:", semdedup_expect())
    print("ivf:", ivf_expect())
