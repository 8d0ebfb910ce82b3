"""Turn-level parse: payload-kind sniff → content extraction → structure.

One pure function ``parse_turn(text) -> (kind, [PartRow])`` used verbatim by
both the single-process oracle and the Spark ``mapInPandas`` stage — the
shared-core guarantee behind per-turn text equality (SURVEY.md §7.4.1).

Replaces the reference's page render + vision-LLM extract + JSON parse
chain (/root/reference/src/pipeline.py:214-256 steps a–d) with a
deterministic dispatch:

- ``[PDF-STREAM v1]`` marker → embedded layout-stream path (pdf_layout);
- HTML sniff → boilerplate-stripping path (html_extract);
- otherwise plain text.
"""

from __future__ import annotations

from pdf_extractor_spark.core import html_extract, pdf_layout
from pdf_extractor_spark.core.structure import PartRow, parse_structure


def content_lines(text: str) -> tuple[str, list[str]]:
    """→ (kind, extracted main-content lines in reading order)."""
    if text is None:
        return ("plain", [])
    if pdf_layout.looks_like_pdf(text):
        extracted = pdf_layout.extract_layout_text(text)
        return ("pdf", extracted.split("\n") if extracted else [])
    if html_extract.looks_like_html(text):
        extracted = html_extract.extract_main_text(text)
        return ("html", extracted.split("\n") if extracted else [])
    return ("plain", text.split("\n"))


def parse_turn(text: str) -> tuple[str, list[PartRow]]:
    kind, lines = content_lines(text)
    return kind, parse_structure(lines)
