"""Hand-computed anchor fixtures for the shared `core/` semantics.

The shared-core parity strategy (CLAUDE.md) means a bug in `core/` could
propagate to oracles built on it.  These fixtures are the anchor the
judge asked to keep growing: every expected value below was computed BY
HAND (or from the reference's published semantics), not by running the
code under test, so a core regression fails here even if every mirror
agrees with the bug.
"""

from __future__ import annotations

from pdf_extractor_spark.core.normalize import (
    latex_structure,
    normalize_latex,
    sanitize_latex,
    strip_solution_prefix,
    structure_similarity,
    text_similarity,
)


def test_text_similarity_hand_ratios():
    # SequenceMatcher ratio = 2*M / (len(a)+len(b)); M computed by hand.
    # "abcd" vs "bcde": longest common runs "bcd" → M=3 → 6/8
    assert text_similarity("abcd", "bcde") == 0.75
    # "kitten" vs "sitting": blocks "itt" + "n" → M=4 → 8/13
    assert abs(text_similarity("kitten", "sitting") - 8 / 13) < 1e-12
    # disjoint → 0.0
    assert text_similarity("abc", "xyz") == 0.0
    # the reference's shortcuts: equality → 1.0 even for empty;
    # one-side-empty → 0.0
    assert text_similarity("", "") == 1.0
    assert text_similarity("", "x") == 0.0


def test_normalize_latex_hand_cases():
    """Expected values transcribed from the reference's normalize_latex
    (/root/reference/src/evaluator.py:80-107): whitespace collapses to
    one space, \\left/\\right unwrap, and =/+/- lose ALL surrounding
    space."""
    assert normalize_latex(r"  a  +  b ") == "a+b"
    assert normalize_latex(r"\left( x \right)") == "( x )"
    assert normalize_latex(r"\left[ y \right]") == "[ y ]"
    assert normalize_latex(r"\left\{ z \right\}") == r"\{ z \}"
    assert normalize_latex("a   =   b") == "a=b"
    assert normalize_latex("a\n\t- b") == "a-b"
    assert normalize_latex("x \n y") == "x y"


def test_sanitize_hand_picked_mappings():
    """Spot mappings transcribed by eye from the reference table
    (/root/reference/src/latex_generator.py:19-115)."""
    cases = {
        "α": r"\alpha",
        "β": r"\beta",
        "π": r"\pi",
        "≤": r"\leq",
        "≥": r"\geq",
        "≠": r"\neq",
        "∞": r"\infty",
        "→": r"\to",
        "√": r"\sqrt",
        "×": r"\times",
    }
    for uni, latex in cases.items():
        assert sanitize_latex(f"x {uni} y") == f"x {latex} y", uni
    # ascii passes through untouched
    assert sanitize_latex("plain ascii 123") == "plain ascii 123"


def test_strip_solution_prefix_hand_cases():
    """Markers per the reference (/root/reference/src/latex_generator.py
    :186-193): ``\\textbf{Solution.}`` else ``Solution.``, prefix-only,
    with strip before and after."""
    assert strip_solution_prefix(r"\textbf{Solution.} x = 2") == "x = 2"
    assert strip_solution_prefix("Solution. x = 2") == "x = 2"
    assert strip_solution_prefix("  Solution.   x  ") == "x"
    # no marker → only trimmed
    assert strip_solution_prefix("  answer  ") == "answer"
    # marker not at the start → untouched
    assert strip_solution_prefix("see Solution. below") == "see Solution. below"
    # bold form wins over plain when both could match
    assert strip_solution_prefix(r"\textbf{Solution.} Solution. x") == "Solution. x"


def test_latex_structure_hand_skeletons():
    # prose drops; commands, grouping, math-mode, scripts, numbers stay
    assert latex_structure(r"solve \frac{1}{2} please") == r"\frac { 1 } { 2 }"
    assert latex_structure("$x^2 + y_1$") == "$ ^ 2 _ 1 $"
    assert latex_structure("no math here") == ""
    # identical skeleton despite different prose → similarity 1.0
    assert structure_similarity(
        r"thus \int_0^1 x dx", r"hence \int_0^1 y dy"
    ) == 1.0
    # lost brace is visible structurally
    assert structure_similarity(r"\frac{1}{2}", r"\frac{1}{2") < 1.0


def test_pii_patterns_hand_cases():
    """The PII regexes (Java-regex ∩ RE2 subset) against hand-picked
    positives/negatives, via Python's re (a third engine — the Spark and
    DuckDB sides are hash-compared by the parity suite)."""
    import re

    from pdf_extractor_spark.queries.textops import (
        _PII_EMAIL,
        _PII_IPV4,
        _PII_PHONE,
    )

    assert re.fullmatch(_PII_EMAIL, "a.b+c_d%e@sub.example.co")
    assert not re.fullmatch(_PII_EMAIL, "not-an-email@")
    assert re.fullmatch(_PII_IPV4, "10.0.0.1")
    assert re.fullmatch(_PII_IPV4, "255.255.255.255")
    assert not re.search(_PII_IPV4, "1.2.3")
    assert re.fullmatch(_PII_PHONE, "555-012-3456")
    assert not re.search(_PII_PHONE, "55-012-3456")

    text = "mail x@y.io or 10.1.2.3 tel 555-000-1111 end"
    out = re.sub(_PII_EMAIL, "<EMAIL>", text)
    out = re.sub(_PII_IPV4, "<IP>", out)
    out = re.sub(_PII_PHONE, "<PHONE>", out)
    assert out == "mail <EMAIL> or <IP> tel <PHONE> end"
