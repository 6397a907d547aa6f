"""Precompute oracle-truth parquet for the pipeline contract queries.

The flagship `extract_pipeline` (and the other pandas-UDF pipeline stages:
`media_meta`, `frame_sample`) cannot be re-expressed as ANSI SQL over the
driver tables — their logic is the pinned reference cascade + the fake-media
decode plumbing.  They CAN be put under the driver's hard DuckDB gate with
precomputed truth: the synthetic corpus is a pure function of (seed, n_docs),
so the expected output per document is computed here WITHOUT Spark (via
tests/oracle.py, doc by doc, single-threaded Python) and committed as
parquet; `oracle_sql()` is then a plain SELECT over `read_parquet(...)`.

The Spark side must reproduce these rows bit-for-bit through explode →
join → salted repartition → mapInPandas → splice — which is exactly the
distribution-mechanics guarantee the hard gate is for.

Each file carries every pre-generated corpus size in one table, keyed by an
``n_docs`` column; the oracle SQL selects the slice whose ``n_docs`` equals
``count(*)`` of the driver's ``documents`` view, so one static SQL string
works at every scale factor (sf0.001 and sf0.01 share n=500, sf0.1 is 5000 —
the corpus depends only on (seed, n), not on the driver tables' content).

Usage: python tools/gen_truth.py  (writes fixtures/truth/*.parquet)
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ocr_spark.config import PipelineConfig  # noqa: E402
from ocr_spark.extraction.fields import FIELD_ORDER  # noqa: E402
from ocr_spark.fixtures import build_corpus  # noqa: E402
from ocr_spark.recognizer import decode_fake_payload as _decode_fake  # noqa: E402
from tests.oracle import expected_document  # noqa: E402
from tests.oracle_ivf import ivf_topk_local, ivf_train_local  # noqa: E402

TRUTH_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "truth")
SEED = 42
SIZES = (500, 5000)  # sf0.001/sf0.01 and sf0.1 document counts
FRAME_EVERY_N = 2  # must match q_frame_sample's every_n

# Span-sequence digest: the canonical per-doc encoding of the north-rule
# invariant (kind, text, media_ref, order).  \x1e/\x1f unit separators and a
# '∅' null sentinel; both sides md5 the UTF-8 bytes.  The Spark twin lives in
# driver_contract.q_extract_pipeline.
NULL_SENTINEL = "∅"
FIELD_SEP = "\x1e"
SPAN_SEP = "\x1f"


def spans_digest(spans_out: list[tuple]) -> str:
    parts = [
        FIELD_SEP.join(
            (
                kind,
                text if text is not None else NULL_SENTINEL,
                media_ref if media_ref is not None else NULL_SENTINEL,
                str(offset),
            )
        )
        for kind, text, media_ref, offset in spans_out
    ]
    return hashlib.md5(SPAN_SEP.join(parts).encode("utf-8")).hexdigest()


def gen_for_n(n_docs: int):
    cfg = PipelineConfig()
    span_rows, media_rows = build_corpus(SEED, n_docs)
    media_by_ref = {m["media_ref"]: m for m in media_rows}

    extract = []
    for span_row in span_rows:
        exp = expected_document(span_row, media_by_ref, cfg)
        row = {
            "n_docs": n_docs,
            "doc_id": exp["doc_id"],
            "n_spans": len(exp["spans_out"]),
            "n_errors": len(exp["errors"]),
            "spans_digest": spans_digest(exp["spans_out"]),
        }
        row.update({k: exp["fields"][k] for k in FIELD_ORDER})
        extract.append(row)

    meta = []
    frames = []
    for m in media_rows:
        content = m["content"]
        try:
            # mirror multimodal.extract_media_meta exactly, including the
            # null-content quarantine (n_bytes stays 0 for missing media)
            if content is None:
                raise ValueError("missing_media")
            payload = _decode_fake(bytes(content))
            lines = payload.get("lines") or []
            err = ""
        except Exception as exc:
            lines, err = [], (str(exc) or "decode_error")
        meta.append({
            "n_docs": n_docs,
            "media_ref": m["media_ref"],
            "fmt": m["fmt"],
            "width": m["width"],
            "height": m["height"],
            "n_lines": len(lines) if not err else 0,
            "n_bytes": len(content) if content is not None else 0,
            "error": err,
        })
        if err:
            frames.append({
                "n_docs": n_docs, "media_ref": m["media_ref"],
                "frame_idx": -1, "frame_ref": "", "error": err,
            })
        else:
            for i in range(0, len(lines), FRAME_EVERY_N):
                frames.append({
                    "n_docs": n_docs, "media_ref": m["media_ref"],
                    "frame_idx": i, "frame_ref": f"{m['media_ref']}#f{i}",
                    "error": "",
                })
    return extract, meta, frames


# --------------------------------------------------------- trained IVF ANN
#
# The trained coarse quantizer depends on the embeddings TABLE CONTENT (the
# driver's testdata), not on (seed, n_docs) — and the sf0.001/sf0.01 tables
# have equal counts but different values, so truth rows are keyed by a
# content fingerprint: md5 over 'vec_id:floor(embedding[1]*1e6)' joined by
# ',' in vec_id order.  The DuckDB oracle recomputes the same fingerprint
# from its embeddings view (driver_contract._sql_ann_ivf_trained), so a
# regenerated testdata set fails LOUDLY (0 oracle rows) instead of
# comparing against stale truth.  Training/search arithmetic is the
# bit-exact Python twin (tests/oracle_ivf.py).

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
IVF_CELLS, IVF_ITERS, IVF_DIMS = 8, 3, 64
IVF_K, IVF_PROBES, IVF_N_QUERIES = 5, 2, 10


def embeddings_fingerprint(ids: list[int], vecs: list[list[float]]) -> str:
    import math

    parts = [
        f"{vid}:{math.floor(float(v[0]) * 1000000.0)}"
        for vid, v in sorted(zip(ids, vecs))
    ]
    return hashlib.md5(",".join(parts).encode("utf-8")).hexdigest()


def gen_ivf_trained() -> list[dict]:
    rows: list[dict] = []
    seen: set[str] = set()
    for d in sorted(os.listdir(TESTDATA_ROOT)):
        path = os.path.join(TESTDATA_ROOT, d, "embeddings.parquet")
        if not os.path.exists(path):
            continue
        table = pq.read_table(path)
        ids = table.column("vec_id").to_pylist()
        vecs = [
            [float(x) for x in v]
            for v in table.column("embedding").to_pylist()
        ]
        key = embeddings_fingerprint(ids, vecs)
        if key in seen:
            continue
        seen.add(key)
        by_id = dict(zip(ids, vecs))
        cents = ivf_train_local(
            [by_id[i] for i in sorted(by_id)],
            n_cells=IVF_CELLS, n_iters=IVF_ITERS, dims=IVF_DIMS,
        )
        qids = sorted(i for i in by_id if i < IVF_N_QUERIES)
        for qid, nid, sim in ivf_topk_local(
            by_id, qids, cents, k=IVF_K, n_probes=IVF_PROBES
        ):
            rows.append({
                "corpus_key": key, "query_id": qid,
                "neighbor_id": nid, "cosine_sim": sim,
            })
        print(f"ivf truth: {d} key={key[:12]} n_vecs={len(ids)}")
    return rows


# ------------------------------------------------- trained quality probe
#
# The trained linear probe (ocr_spark/classifier.py) is iterative GD —
# not expressible in the DuckDB oracle — so, like the trained IVF
# quantizer, it goes under the hard gate via precomputed truth from the
# bit-exact plain-Python twin (tests/oracle_clf.py): train on the
# documents table with label (lang == 'en'), score every doc, key the
# rows by a content fingerprint over (doc_id, text, lang) so regenerated
# testdata fails LOUDLY (0 oracle rows) instead of matching stale truth.
# NOTE the corpus property this encodes: the driver's synthetic
# documents draw every language's text from ONE vocabulary, so the lang
# label is text-independent by construction and the trained probe's
# accuracy sits at the base rate — the gate is the exact train+score
# ARITHMETIC; that the probe learns real signals is proven on a
# separable corpus in tests/test_classifier.py.

def documents_fingerprint(
    ids: list[int], texts: list[str | None], langs: list[str | None]
) -> str:
    parts = [
        f"{did}:"
        f"{hashlib.md5(((t if t is not None else chr(1))).encode('utf-8')).hexdigest()}"
        f":{lang if lang is not None else chr(1)}"
        for did, t, lang in sorted(
            zip(ids, texts, langs), key=lambda r: r[0]
        )
    ]
    return hashlib.md5(",".join(parts).encode("utf-8")).hexdigest()


#: clf truth parquet schema — shared with the dialect-edge test's
#: ad-hoc-corpus truth writer so the two cannot drift
CLF_TRUTH_FIELDS = [
    ("corpus_key", pa.string()), ("doc_id", pa.int64()),
    ("clf_prob_ppm", pa.int64()),
]


def clf_truth_rows(
    ids: list[int], texts: list[str | None], langs: list[str | None]
) -> tuple[str, list[dict]]:
    """``(corpus_key, truth rows)`` for ONE corpus — the single
    definition of the label rule (``lang == 'en'``), contract
    constants, and row shape, used by both the committed-fixture
    generator below and tests/test_oracle_dialect_edges.py's
    ad-hoc-corpus truth (a drift between the two would let the
    dialect gate and the driver gate verify different things)."""
    from ocr_spark.classifier import (
        CONTRACT_DIMS, CONTRACT_ITERS, CONTRACT_LR_PPM,
    )
    from tests.oracle_clf import features_local, score_local, train_local

    key = documents_fingerprint(ids, texts, langs)
    feats = [
        (features_local(t, CONTRACT_DIMS), 1 if lang == "en" else 0)
        for t, lang in zip(texts, langs)
    ]
    w, b = train_local(
        feats, CONTRACT_DIMS, CONTRACT_ITERS, CONTRACT_LR_PPM
    )
    rows = [
        {
            "corpus_key": key,
            "doc_id": did,
            "clf_prob_ppm": score_local(s, w, b)[1],
        }
        for did, (s, _y) in zip(ids, feats)
    ]
    return key, rows


def gen_clf_quality() -> list[dict]:
    rows: list[dict] = []
    seen: set[str] = set()
    for d in sorted(os.listdir(TESTDATA_ROOT)):
        path = os.path.join(TESTDATA_ROOT, d, "documents.parquet")
        if not os.path.exists(path):
            continue
        table = pq.read_table(path)
        ids = table.column("doc_id").to_pylist()
        texts = table.column("text").to_pylist()
        langs = table.column("lang").to_pylist()
        key, corpus_rows = clf_truth_rows(ids, texts, langs)
        if key in seen:
            continue
        seen.add(key)
        rows.extend(corpus_rows)
        print(f"clf truth: {d} key={key[:12]} n_docs={len(ids)}")
    return rows


def _write(name: str, rows: list[dict], schema: pa.Schema) -> None:
    table = pa.Table.from_pylist(rows, schema=schema)
    out = os.path.join(TRUTH_DIR, f"{name}.parquet")
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")


def main() -> None:
    os.makedirs(TRUTH_DIR, exist_ok=True)
    extract_all, meta_all, frames_all = [], [], []
    for n in SIZES:
        e, m, f = gen_for_n(n)
        extract_all += e
        meta_all += m
        frames_all += f

    extract_schema = pa.schema(
        [("n_docs", pa.int64()), ("doc_id", pa.string()),
         ("n_spans", pa.int64()), ("n_errors", pa.int64()),
         ("spans_digest", pa.string())]
        + [(f, pa.bool_() if f == "es_ine" else pa.string())
           for f in FIELD_ORDER]
    )
    _write("extract_pipeline", extract_all, extract_schema)

    meta_schema = pa.schema([
        ("n_docs", pa.int64()), ("media_ref", pa.string()),
        ("fmt", pa.string()), ("width", pa.int32()), ("height", pa.int32()),
        ("n_lines", pa.int32()), ("n_bytes", pa.int64()),
        ("error", pa.string()),
    ])
    _write("media_meta", meta_all, meta_schema)

    frame_schema = pa.schema([
        ("n_docs", pa.int64()), ("media_ref", pa.string()),
        ("frame_idx", pa.int32()), ("frame_ref", pa.string()),
        ("error", pa.string()),
    ])
    _write("frame_sample", frames_all, frame_schema)

    ivf_schema = pa.schema([
        ("corpus_key", pa.string()), ("query_id", pa.int64()),
        ("neighbor_id", pa.int64()), ("cosine_sim", pa.float64()),
    ])
    _write("ann_ivf_trained", gen_ivf_trained(), ivf_schema)

    _write("clf_quality", gen_clf_quality(), pa.schema(CLF_TRUTH_FIELDS))


if __name__ == "__main__":
    main()
