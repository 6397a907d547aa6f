"""Plain-Python twin of the trained linear probe (ocr_spark.classifier).

Independent arithmetic — own tokenizer, own md5 hash, own sigmoid and
update code — so a defect in the library cannot hide in a shared
helper.  Everything is exact integer arithmetic, which is the point:
the Spark trainer must land on THESE weights int-for-int regardless of
partitioning, and tools/gen_truth.py commits this twin's scores as the
driver-gate fixture for the ``doc_stats.clf_prob_ppm`` column.

Tokenizer note: ASCII whitespace class ``[ \\t\\n\\x0b\\f\\r]`` with
empties filtered — the exact semantics of ``textstats.tokens`` (Java
``\\s`` is ASCII-only; Python ``str.split``/``\\s`` are Unicode-aware
and would diverge on e.g. NBSP).
"""

from __future__ import annotations

import hashlib
import re

UNIT = 1_000_000

_WS = re.compile("[ \t\n\x0b\f\r]+")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def features_local(text: str | None, dims: int) -> list[int]:
    """Signed feature-hash vote sums — twin of
    similarity.hashed_token_sums for one document."""
    s = [0] * dims
    for tok in _WS.split(text or ""):
        if tok == "":
            continue
        h = _h60(tok)
        s[h % dims] += 1 if (h >> 20) & 1 else -1
    return s


def sigmoid_ppm_local(z: int) -> int:
    az = -z if z < 0 else z
    mag = (500_000 * az) // (UNIT + az)
    return 500_000 + (mag if z >= 0 else -mag)


def train_local(
    rows: list[tuple[list[int], int]],
    dims: int,
    iters: int,
    lr_ppm: int,
) -> tuple[list[int], int]:
    """Full-batch GD over ``(features, label)`` rows → ``(w, b)`` in
    ppm ints.  Same loss, link, and sign-split update as the library —
    re-implemented, not imported."""
    w = [0] * dims
    b = 0
    n = len(rows)
    if n == 0:
        raise ValueError("empty training set")

    def step(g: int) -> int:
        mag = (lr_ppm * (-g if g < 0 else g)) // (n * UNIT)
        return mag if g >= 0 else -mag

    for _ in range(iters):
        grads = [0] * dims
        gb = 0
        for s, y in rows:
            z = sum(wj * sj for wj, sj in zip(w, s)) + b
            r = sigmoid_ppm_local(z) - y * UNIT
            gb += r
            for j in range(dims):
                grads[j] += r * s[j]
        w = [wj - step(gj) for wj, gj in zip(w, grads)]
        b -= step(gb)
    return w, b


def score_local(
    s: list[int], w: list[int], b: int
) -> tuple[int, int]:
    """``(z_ppm, clf_prob_ppm)`` for one feature row."""
    z = sum(wj * sj for wj, sj in zip(w, s)) + b
    return z, sigmoid_ppm_local(z)
