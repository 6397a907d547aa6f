"""Engine-dialect pins: the Spark query and its DuckDB oracle must agree
on the inputs where the dialects genuinely differ — vertical-tab
whitespace (Java's ``\\s`` includes ``\\x0b``, RE2's excludes it) and
NULL text (Spark ``concat`` NULL-propagates, DuckDB skips NULL
arguments).  Both divergences were latent until round 5 aligned the
oracle fragments (explicit whitespace class, load-bearing coalesce);
these tests feed the adversarial inputs directly so the alignment can
never silently regress."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_spark.driver_contract import registry

ADVERSARIAL_DOCS = [
    # \x0b between tokens: Java \s splits it, RE2 \s (pre-fix) did not
    (1, "alpha\x0bbeta  gamma delta epsilon", "en", "web", 30),
    # NULL text: concat semantics differ across engines without coalesce
    (2, None, "en", "web", 0),
    (3, "plain text document with several ordinary tokens here", "es",
     "books", 53),
    # mixed whitespace incl. \x0b adjacent to \t and \n
    (4, "tab\tand\nnewline\x0bmix  double  spaced tokens", "en", "web", 41),
    (5, "", "fr", "code", 0),
]

# queries whose Spark side and oracle both read ONLY the documents table
# and exercise tokenization/normalization/synthesis fragments
QUERIES = [
    "normalize_lines", "doc_stats", "text_cleaners", "vocab_topk",
    "dedup_exact", "repetition_stats", "lm_score", "classify_credential",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _clf_truth_for(docs_rows, out_dir) -> None:
    """Fixture-gate truth for an AD-HOC corpus: ``doc_stats`` carries the
    trained-probe column, whose oracle reads content-fingerprinted truth
    (tools/gen_truth.py) — an arbitrary test corpus has no committed row,
    so the test computes the twin's truth itself (which ALSO extends the
    twin differential to these adversarial \\x0b/NULL inputs) and points
    ``driver_contract._TRUTH_DIR`` at it.  Row construction, label rule,
    and schema are SHARED with the committed-fixture generator
    (tools/gen_truth.clf_truth_rows) so the two gates cannot drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.gen_truth import CLF_TRUTH_FIELDS, clf_truth_rows

    _key, rows = clf_truth_rows(
        [r[0] for r in docs_rows],
        [r[1] for r in docs_rows],
        [r[2] for r in docs_rows],
    )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(CLF_TRUTH_FIELDS)),
        str(out_dir / "clf_quality.parquet"),
    )


@pytest.mark.parametrize("name", QUERIES)
def test_twins_agree_on_vt_and_null_text(spark, tmp_path, monkeypatch, name):
    sf = str(tmp_path)
    spark.createDataFrame(
        ADVERSARIAL_DOCS,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    truth = tmp_path / "truth"
    truth.mkdir()
    _clf_truth_for(ADVERSARIAL_DOCS, truth)
    import ocr_spark.driver_contract as dc
    monkeypatch.setattr(dc, "_TRUTH_DIR", str(truth))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    fn, sql = registry()[name]
    sdf = fn(spark, sf).toPandas()
    ddf = con.sql(sql).df()
    assert len(sdf) == len(ddf), (name, len(sdf), len(ddf))
    assert sorted(sdf.columns) == sorted(ddf.columns)
    a, b = _canon(sdf), _canon(ddf)
    diff = (a != b) & ~(a.isna() & b.isna())
    bad = diff.any(axis=1)
    assert not bad.any(), (
        f"{name}: {int(bad.sum())} rows differ\n"
        f"spark: {a[bad].head(3).to_dict('records')}\n"
        f"duck : {b[bad].head(3).to_dict('records')}"
    )
