"""Cross-turn linking + span stitching — the shared semantic contract.

This module is the *single-process* (oracle) implementation; the Spark job
implements the SAME contract with window functions + native aggregation
(gaps-and-islands).  Tests assert row-for-row equality between the two.

Parity targets:

- id inheritance of part-at-top rows ≙ the reference's previous-page
  context rule (/root/reference/prompts/extraction.md:82-90,
  /root/reference/src/pipeline.py:227-243 — W1 in SURVEY.md §2.5);
- span stitching ≙ /root/reference/src/pipeline.py:17-89 (J1): merge a
  part flagged ``continues_next`` with the next turn's continuation
  fragment flagged ``continued_prev``; question text appended only when
  different (:54-57), answers joined with ``"\\n\\n"`` (:59), chain
  propagation so 3+-turn spans stitch (:67), turn_range widened (:72-75);
- flatten + full id ≙ /root/reference/src/pipeline.py:267-287 (E1, T7);
  spans rooted in unmarked fragments get fallback id ``t{turn_idx}``,
  which the reference's sort fallback (pipeline.py:113) orders
  lexicographically.

Stitching contract (shared with the Spark implementation — this is the
gaps-and-islands form; the reference's nested-loop join reduces to it
because, under this parser, only unmarked leading fragments ever carry
``continued_prev``, and the continuing part is always the LAST row of its
turn, so group-adjacency in the reference's (question_id, part_id) match
equals row-adjacency in (turn_idx, seq) order):

1. id fill: a row with ``question_id is None`` and ``part_id`` set
   (part-at-top) takes the last non-null question_id in (turn_idx, seq)
   order.
2. boundary rule: in (turn_idx, seq) order, a row CONTINUES the open span
   iff ``continued_prev`` AND the previous row has ``continues_next`` AND
   sits on ``turn_idx - 1``.  Otherwise it starts a new span.
3. fold each span in order with the reference merge semantics
   (question append-if-different, ``"\\n\\n"`` answer join).
"""

from __future__ import annotations

from dataclasses import dataclass

from pdf_extractor_spark.core.structure import PartRow


@dataclass
class LinkedRow:
    conv_id: str
    turn_idx: int
    seq: int
    question_id: str | None
    part_id: str | None
    question_latex: str
    answer_latex: str
    continues_next: bool
    continued_prev: bool


@dataclass
class Span:
    conv_id: str
    turn_idx: int            # start turn
    span_id: str             # full id, e.g. "2.8a" or fallback "t7"
    question_latex: str
    answer_latex: str        # raw merged answer (pre prefix-strip)
    turn_range: tuple[int, int]
    n_fragments: int


def link_ids(rows: list[LinkedRow]) -> None:
    """Contract step 1, in place.  ``rows`` must be in (turn_idx, seq)
    order for one conversation."""
    last_qid: str | None = None
    for r in rows:
        if r.question_id is None and r.part_id is not None:
            r.question_id = last_qid
        if r.question_id is not None:
            last_qid = r.question_id


def stitch(rows: list[LinkedRow]) -> list[Span]:
    """Contract steps 2–3; ``rows`` in (turn_idx, seq) order."""
    spans: list[Span] = []
    cur: list[LinkedRow] = []
    for r in rows:
        if (
            cur
            and r.continued_prev
            and cur[-1].turn_idx == r.turn_idx - 1
            and cur[-1].continues_next
        ):
            cur.append(r)
        else:
            if cur:
                spans.append(_fold(cur))
            cur = [r]
    if cur:
        spans.append(_fold(cur))
    return spans


def _fold(frags: list[LinkedRow]) -> Span:
    first = frags[0]
    merged_q = first.question_latex
    merged_a = first.answer_latex
    for nxt in frags[1:]:
        if nxt.question_latex and nxt.question_latex != merged_q:
            merged_q = merged_q + " " + nxt.question_latex
        merged_a = merged_a + "\n\n" + nxt.answer_latex
    if first.question_id is not None:
        span_id = first.question_id + (first.part_id or "")
    else:
        span_id = f"t{first.turn_idx}"
    return Span(
        conv_id=first.conv_id,
        turn_idx=first.turn_idx,
        span_id=span_id,
        question_latex=merged_q,
        answer_latex=merged_a,
        turn_range=(first.turn_idx, frags[-1].turn_idx),
        n_fragments=len(frags),
    )


def to_linked_rows(
    conv_id: str, per_turn: list[tuple[int, list[PartRow]]]
) -> list[LinkedRow]:
    rows: list[LinkedRow] = []
    for turn_idx, parts in per_turn:
        for p in parts:
            rows.append(LinkedRow(
                conv_id=conv_id, turn_idx=turn_idx, seq=p.seq,
                question_id=p.question_id, part_id=p.part_id,
                question_latex=p.question_latex, answer_latex=p.answer_latex,
                continues_next=p.continues_next,
                continued_prev=p.continued_prev,
            ))
    return rows
