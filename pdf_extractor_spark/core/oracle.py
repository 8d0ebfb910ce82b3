"""Single-process oracle: the reference pipeline semantics end to end.

Runs the shared core (parse → link → stitch → resolve → normalize → sort)
sequentially over a transcripts table.  The Spark job must match this
row-for-row under ``ORDER BY conv_id, turn_idx, span_id`` — the per-turn
text-equality gate from BASELINE.json.

Stage parity map (reference = /root/reference/src):

    parse_turn        ≙ pipeline.py:214-256 (render + LLM extract + parse)
    link_ids/stitch   ≙ pipeline.py:17-89 + 227-243
    flatten           ≙ pipeline.py:267-287
    resolve_fixpoint  ≙ reference_resolver.py:401-465 (deterministic form)
    sort              ≙ pipeline.py:92-127, 307-309
    normalize (sink)  ≙ latex_generator.py:118-129, 187-193
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pdf_extractor_spark.core import refs as refs_mod
from pdf_extractor_spark.core.normalize import sanitize_latex, strip_solution_prefix
from pdf_extractor_spark.core.parse_turn import parse_turn
from pdf_extractor_spark.core.stitch import LinkedRow, link_ids, stitch, to_linked_rows
from pdf_extractor_spark.core.structure import parse_qa_id

OUTPUT_COLUMNS = [
    "conv_id", "turn_idx", "span_id", "question_latex", "text",
    "turn_start", "turn_end", "kind", "n_fragments", "had_reference",
]


def extract_conversation(
    conv_id: str, turns: list[tuple[int, str]]
) -> list[dict]:
    """turns: [(turn_idx, text)] — any order; sorted here (stable ordering
    is part of the contract)."""
    turns = sorted(turns, key=lambda t: t[0])
    per_turn = []
    kinds: dict[int, str] = {}
    for turn_idx, text in turns:
        kind, parts = parse_turn(text)
        # Sanitize at fragment level (contract: char-local replacement
        # commutes with stitching/concatenation; doing it pre-detection in
        # BOTH oracle and Spark keeps reference detection inputs identical).
        for p in parts:
            p.question_latex = sanitize_latex(p.question_latex)
            p.answer_latex = sanitize_latex(p.answer_latex)
        kinds[turn_idx] = kind
        per_turn.append((turn_idx, parts))

    rows: list[LinkedRow] = to_linked_rows(conv_id, per_turn)
    link_ids(rows)
    spans = stitch(rows)  # document order: (turn_idx, span_id)

    resolved = refs_mod.resolve_fixpoint(
        [(s.span_id, s.question_latex, s.answer_latex) for s in spans]
    )

    out = []
    for s, (answer, had_ref) in zip(spans, resolved):
        text = strip_solution_prefix(answer)
        out.append({
            "conv_id": s.conv_id,
            "turn_idx": s.turn_idx,
            "span_id": s.span_id,
            "question_latex": s.question_latex,
            "text": text,
            "turn_start": s.turn_range[0],
            "turn_end": s.turn_range[1],
            "kind": kinds.get(s.turn_idx, "plain"),
            "n_fragments": s.n_fragments,
            "had_reference": had_ref,
        })
    out.sort(key=lambda r: parse_qa_id(r["span_id"]))
    return out


def extract_table(records: Iterable[Mapping]) -> list[dict]:
    """records: mappings with at least conv_id, turn_idx, text.
    Returns all spans sorted by (conv_id, then reference id order)."""
    convs: dict[str, list[tuple[int, str]]] = {}
    for r in records:
        convs.setdefault(r["conv_id"], []).append((int(r["turn_idx"]), r["text"]))
    out: list[dict] = []
    for conv_id in sorted(convs):
        out.extend(extract_conversation(conv_id, convs[conv_id]))
    return out
