"""Property-based tests (hypothesis) for the shared extraction core.

The pytest suite's fixtures cover the generator's payload classes; these
properties cover arbitrary adversarial inputs — the parser must never
raise, always yield well-formed fragments, and the normalizer chains must
be idempotent where the reference semantics say so.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.core.normalize import (
    normalize_latex,
    sanitize_latex,
    strip_solution_prefix,
)
from pdf_extractor_spark.core.parse_turn import parse_turn
from pdf_extractor_spark.core.refs import detect_ref, resolve_fixpoint

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_parse_turn_total(text):
    """Parser is total: any unicode payload parses without raising and
    yields fragments with monotonically increasing seq."""
    kind, parts = parse_turn(text)
    assert kind in {"plain", "html", "pdf"}
    seqs = [p.seq for p in parts]
    assert seqs == sorted(seqs)
    for p in parts:
        assert isinstance(p.question_latex, str)
        assert isinstance(p.answer_latex, str)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_sanitize_idempotent_after_first_pass(text):
    """No LaTeX command produced by the table contains a source unicode
    char, so a second sanitize pass is a no-op (replacement chain is
    confluent on its own output)."""
    once = sanitize_latex(text)
    assert sanitize_latex(once) == once


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_strip_prefix_idempotent_when_no_marker_remains(text):
    stripped = strip_solution_prefix(text)
    if not stripped.startswith(("Solution.", "\\textbf{Solution.}")):
        assert strip_solution_prefix(stripped) == stripped


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_normalize_idempotent(text):
    once = normalize_latex(text)
    assert normalize_latex(once) == once


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(
        st.from_regex(r"[1-9]\.[1-9][ab]?", fullmatch=True),
        text_strategy,
        text_strategy,
    ),
    max_size=8,
))
def test_resolve_fixpoint_stable(spans):
    """Fixpoint output is the same whether run once (MAX_DEPTH passes) or
    fed its own resolved output's references again — and never raises."""
    out = resolve_fixpoint(spans)
    assert len(out) == len(spans)
    for (resolved, had_ref), (sid, q, a) in zip(out, spans):
        assert resolved.startswith(a)  # resolution only appends
        assert had_ref == (detect_ref(q, a) is not None)
