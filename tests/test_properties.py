"""Property-based tests (hypothesis) for the pure extraction/curation
primitives — the invariants SURVEY.md §5.2(3) calls out, plus bounds for
the curation math.  All Spark-free: the same functions run inside the
pandas UDFs, and native↔Python equality is covered elsewhere."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.boilerplate import strip_boilerplate
from ocr_spark.extraction.lines import normalize_lines, search_lines
from ocr_spark.extraction.name import clean_name
from ocr_spark.extraction.name_split import (
    split_name_by_curp,
    strip_cp_from_colonia as strip_cp,
)

lines_st = st.lists(
    st.text(alphabet=" \t\nABCdef123ÁÑ/-.", max_size=30), max_size=12
)
words_st = st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZÁÉÍÓÚÑ", min_size=1,
                   max_size=10)


@settings(max_examples=200, deadline=None)
@given(lines_st)
def test_normalize_idempotent(lines):
    once = normalize_lines(lines)
    assert normalize_lines(once) == once
    # outputs are trimmed, collapsed, non-empty
    for line in once:
        assert line == line.strip()
        assert "  " not in line and line != ""


@settings(max_examples=200, deadline=None)
@given(lines_st)
def test_order_sensitivity_is_real(lines):
    """Line order IS semantics: the first-match scan over reversed input
    must return the first match of the reversed order (i.e., the scan never
    sorts or dedups behind the caller's back)."""
    clean = normalize_lines(lines)
    pat = r"(\d{3})"
    fwd = search_lines(pat, clean)
    rev = search_lines(pat, list(reversed(clean)))
    matches = [m.group(1) for line in clean
               for m in [re.search(pat, line)] if m]
    assert fwd == (matches[0] if matches else "")
    rev_matches = [m.group(1) for line in reversed(clean)
                   for m in [re.search(pat, line)] if m]
    assert rev == (rev_matches[0] if rev_matches else "")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ABC ole 0123456789", max_size=40),
       st.integers(10000, 99999))
def test_strip_cp_removes_only_the_exact_token(colonia, cp):
    out = strip_cp(colonia, str(cp))
    # the exact CP token never survives...
    assert not re.search(rf"\b{cp}\b", out)
    # ...and every other whitespace token survives (modulo collapsing)
    kept = [t for t in colonia.split() if t != str(cp)]
    assert out.split() == kept


@settings(max_examples=150, deadline=None)
@given(st.lists(words_st, min_size=0, max_size=6).map(" ".join))
def test_clean_name_survivors_are_input_tokens(name):
    out = clean_name(name)
    in_tokens = name.split()
    for tok in out.split():
        assert tok in in_tokens
    # idempotent: cleaning a cleaned name changes nothing
    assert clean_name(out) == out


@settings(max_examples=100, deadline=None)
@given(st.lists(words_st, min_size=1, max_size=5).map(" ".join),
       st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789", min_size=0,
               max_size=18))
def test_split_name_total_and_partitioning(name, curp):
    """The splitter is total (never raises) and its three parts are a
    reordering-free partition of the cleaned name tokens."""
    parts = split_name_by_curp(name, curp)
    assert set(parts) == {"apellido_paterno", "apellido_materno", "nombres"}
    joined = " ".join(
        p for p in (parts["apellido_paterno"], parts["apellido_materno"],
                    parts["nombres"]) if p
    ).split()
    from ocr_spark.extraction.name_split import letters_only
    cleaned = letters_only(name).split()
    if len(cleaned) >= 3:
        assert joined == cleaned


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_boilerplate_output_is_collapsed_and_total(text):
    out = strip_boilerplate(text)
    assert out is not None
    assert out == out.strip()
    assert "  " not in out
    if "<" not in text:
        # plain text passes through modulo whitespace normalization
        assert out == re.sub(r"\s+", " ", text).strip()


# ------------------------------------------------- round-3 operator props

ivals_st = st.lists(
    st.tuples(
        st.floats(0, 1e6, allow_nan=False, width=32),
        st.floats(0, 1e3, allow_nan=False, width=32),
        st.integers(1, 5),
    ).map(lambda t: (t[0], t[0] + t[1], t[2])),
    max_size=12,
)


@given(ivals_st, st.floats(0.1, 1e4, allow_nan=False))
@settings(deadline=None)
def test_merge_session_intervals_properties(ivals, gap):
    """Output intervals are disjoint with gaps > gap, sorted, conserve
    the event count, span the input range, and the merge is idempotent."""
    from ocr_spark.streaming import merge_session_intervals

    merged = merge_session_intervals(ivals, gap)
    assert sum(c for _, _, c in merged) == sum(c for _, _, c in ivals)
    for (s1, e1, _), (s2, _, _) in zip(merged, merged[1:]):
        assert s1 <= s2 and s2 - e1 > gap
    for s, e, _ in merged:
        assert s <= e
    if ivals:
        assert merged[0][0] == min(s for s, _, _ in ivals)
        assert merged[-1][1] == max(e for _, e, _ in ivals)
    assert merge_session_intervals(merged, gap) == merged


@given(st.lists(st.integers(1, 50), min_size=1, max_size=60),
       st.integers(10, 200))
def test_next_fit_bin_arithmetic(token_counts, target):
    """The floor(tokens_before/target) bin rule (assembly.pack_sequences)
    yields monotone bins whose closed totals are within one document of
    the target — the documented packing contract, checked shard-locally
    in plain Python."""
    before = 0
    bins: dict[int, int] = {}
    for n in token_counts:
        b = before // target
        bins[b] = bins.get(b, 0) + n
        before += n
    max_doc = max(token_counts)
    last = max(bins)
    for b, tot in bins.items():
        if b != last:
            assert tot >= target - max_doc
        assert tot <= target + max_doc
    assert sorted(bins) == list(bins)  # insertion order == ascending
