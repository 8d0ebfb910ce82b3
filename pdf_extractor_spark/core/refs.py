"""Deterministic cross-reference detection + resolution.

Replaces the reference's two LLM stages (detect:
/root/reference/src/reference_resolver.py:230-278, resolve: :280-359) with
a regex pattern library (the plan the reference itself sketched at
/root/reference/plan.md:242-254) and a deterministic inline rewrite.

Semantics cloned:

- only the FIRST essential reference is resolved
  (reference_resolver.py:319-320 — F4 in SURVEY.md §2.2);
- missing target → "could not resolve" path (:338-345), answer unchanged;
- lookup map built id→QA with LAST-in-document-order wins
  (reference_resolver.py:414 dict comprehension semantics);
- chained references: the reference mutates its lookup dict in document
  order (:458), which is order-dependent.  The rebuild instead iterates the
  resolution to a bounded FIXPOINT (MAX_DEPTH simultaneous passes), which
  is order-independent and hence parallel-safe (SURVEY.md §4.3).  Oracle
  and Spark job share this exact contract: always MAX_DEPTH passes (extra
  passes after convergence are no-ops, so early-exit is an optimization,
  not a semantic difference).

The deterministic rewrite appends the referenced answer as an explicit
context block::

    <answer> + "\\n\\n[Context " + ref_id + "] " + <referenced answer>

so per-turn text equality is well-defined without an LLM.
"""

from __future__ import annotations

import re
from typing import Sequence

# Explicit-id reference patterns (detect → ref id in group 1).
REF_ID_PATTERNS: tuple[re.Pattern, ...] = (
    re.compile(
        r"(?:using|from|by|see|as in)\s+"
        r"(?:the result of |the result from |problem |question |exercise |part )?"
        r"(\d+\.\d+[a-z]?)\b",
        re.IGNORECASE,
    ),
    re.compile(r"\b(?:problem|question|exercise)\s+(\d+\.\d+[a-z]?)\b", re.IGNORECASE),
)

MAX_DEPTH = 3
CONTEXT_OPEN = "\n\n[Context "
CONTEXT_CLOSE = "] "


def detect_ref(question: str, answer: str) -> str | None:
    """First explicit reference id in the Q&A text, or None."""
    text = question + " " + answer
    best: tuple[int, str] | None = None
    for pat in REF_ID_PATTERNS:
        m = pat.search(text)
        if m and (best is None or m.start(1) < best[0]):
            best = (m.start(1), m.group(1))
    return best[1] if best else None


def resolve_fixpoint(
    spans: Sequence[tuple[str, str, str]],
) -> list[tuple[str, bool]]:
    """``spans``: document-ordered (span_id, question_latex, answer_latex).

    Returns, in the same order, (resolved_answer, had_reference) after
    MAX_DEPTH simultaneous passes.  The id→answer lookup keeps the LAST
    occurrence per id in document order; a span never resolves against its
    own id (self-reference is a no-op).
    """
    n = len(spans)
    refs = [detect_ref(q, a) for (_, q, a) in spans]
    resolved = [a for (_, _, a) in spans]

    for _ in range(MAX_DEPTH):
        lookup: dict[str, str] = {}
        for i in range(n):  # last-wins in document order
            lookup[spans[i][0]] = resolved[i]
        nxt = []
        changed = False
        for i in range(n):
            sid, _, base_answer = spans[i]
            rid = refs[i]
            if rid is not None and rid != sid and rid in lookup:
                new = base_answer + CONTEXT_OPEN + rid + CONTEXT_CLOSE + lookup[rid]
            else:
                new = base_answer
            if new != resolved[i]:
                changed = True
            nxt.append(new)
        resolved = nxt
        if not changed:
            break
    return [(resolved[i], refs[i] is not None) for i in range(n)]
