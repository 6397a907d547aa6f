"""Plain-Python twin of the trained-IVF ANN path (no Spark, no DuckDB).

Replays ``similarity.ivf_train_kmeans`` + ``similarity.ivf_search``
arithmetic exactly: left-fold dot products (``aggregate`` with a 0.0
init), integer micro-unit centroid sums (``UNIT_SCALE``), struct-ordering
tie-breaks, and the floor-truncated cosine.  Training sums are exact
integers and every float op is the same IEEE-754 double op Spark executes,
so the twin is bit-identical to the Spark result — which is what lets the
trained quantizer sit under the hard precomputed-truth gate
(tools/gen_truth.py → fixtures/truth/ann_ivf_trained.parquet).
"""

from __future__ import annotations

import math

from ocr_spark.similarity import (
    UNIT_SCALE,
    _normalize,
    centroid_from_unit_sums,
    hyperplanes,
)


def dot_left_fold(a, b) -> float:
    """Twin of similarity.dot_fold: 0.0-seeded sequential left fold."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def cosine_trunc6(a, b) -> float:
    """Twin of similarity.cosine (floor-truncated to 6 digits)."""
    na = math.sqrt(dot_left_fold(a, a))
    nb = math.sqrt(dot_left_fold(b, b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return math.floor(dot_left_fold(a, b) / (na * nb) * 1000000.0) / 1000000.0


def argmax_cell(vec, centroids) -> int:
    """Twin of similarity._cell_of: max by (score, prio=-i) struct order —
    ties go to the LOWEST centroid id."""
    return max(
        range(len(centroids)),
        key=lambda i: (dot_left_fold(vec, centroids[i]), -i),
    )


def probe_cells(vec, centroids, n_probes: int) -> list[int]:
    """Twin of ivf_search's reverse(array_sort(structs)) slice: cells by
    score descending, ties to the lowest id."""
    order = sorted(
        range(len(centroids)),
        key=lambda i: (-dot_left_fold(vec, centroids[i]), i),
    )
    return order[:n_probes]


def ivf_train_local(
    vecs: list[list[float]],
    n_cells: int = 16,
    n_iters: int = 5,
    dims: int = 64,
    seed: str = "ivf",
) -> list[list[float]]:
    """Twin of similarity.ivf_train_kmeans over an in-memory vector list."""
    centroids = [_normalize(c) for c in hyperplanes(n_cells, dims, seed)]
    for _ in range(n_iters):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for v in vecs:
            cell = argmax_cell(v, centroids)
            counts[cell] = counts.get(cell, 0) + 1
            acc = sums.setdefault(cell, [0] * dims)
            for d in range(dims):
                acc[d] += math.floor(float(v[d]) * UNIT_SCALE)
        centroids = [
            centroid_from_unit_sums(sums[i], counts[i])
            if i in sums else centroids[i]
            for i in range(n_cells)
        ]
    return centroids


def ivf_topk_local(
    by_id: dict[int, list[float]],
    query_ids: list[int],
    centroids: list[list[float]],
    k: int = 5,
    n_probes: int = 2,
) -> list[tuple[int, int, float]]:
    """Twin of similarity.ivf_search: (query_id, neighbor_id, cosine_sim)
    rows, ≤ k per query, ordered (cosine desc, neighbor_id asc)."""
    assigned = {
        vid: argmax_cell(v, centroids) for vid, v in by_id.items()
    }
    rows: list[tuple[int, int, float]] = []
    for qid in query_ids:
        qv = by_id[qid]
        cells = set(probe_cells(qv, centroids, n_probes))
        scored = [
            (vid, cosine_trunc6(v, qv))
            for vid, v in by_id.items()
            if vid != qid and assigned[vid] in cells
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        rows.extend((qid, vid, sim) for vid, sim in scored[:k])
    return rows
