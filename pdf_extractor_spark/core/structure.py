"""Structural parse of a turn's extracted content text.

Deterministic replacement of the reference's per-page LLM structuring
(/root/reference/src/llm_extractor.py:77-106 + the rules in
/root/reference/prompts/extraction.md): item ids (``2.8``), lettered parts
(``(a)``), ``Solution.`` answer markers, span-continuation flags, and the
part-at-top-of-page id inheritance rule
(/root/reference/prompts/extraction.md:82-90, CLAUDE.md:120-132).

The parser is **turn-local** (embarrassingly parallel); everything that
needs cross-turn knowledge (id inheritance, span stitching) is deferred to
the linking stage — the two-phase "parse local, link global" design from
SURVEY.md §4.1.

Output rows (one per question part, in document order)::

    seq                int   order within the turn
    question_id        str|None   e.g. "2.8"; None → inherit from history
    part_id            str|None   e.g. "a"
    question_latex     str
    answer_latex       str   (includes the Solution marker if present)
    continues_next     bool  answer is unfinished at turn end
    continued_prev     bool  fragment starts mid-answer (unmarked leading text)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

ITEM_RE = re.compile(r"^(\d+\.\d+)\s*(.*)$")
PART_RE = re.compile(r"^\(([a-z])\)\s*(.*)$")
SOLUTION_RE = re.compile(r"^(\\textbf\{Solution\.\}|Solution\.)\s*(.*)$")
QA_ID_RE = re.compile(r"^(\d+)\.(\d+)([a-z]*)$")

# A part's answer "continues" if it does not end in terminal punctuation.
_TERMINAL = (".", "!", "?")


def parse_qa_id(qa_id: str) -> tuple[float, float, str]:
    """Sort key for ids like ``2.18a`` — parity with
    /root/reference/src/pipeline.py:92-113 including the (0.0, 0.0, id)
    fallback for unparseable ids."""
    m = QA_ID_RE.match(qa_id.strip())
    if m:
        return (float(m.group(1)), float(m.group(2)), m.group(3) or "")
    return (0.0, 0.0, qa_id)


@dataclass
class PartRow:
    seq: int
    question_id: str | None
    part_id: str | None
    question_latex: str
    answer_latex: str
    continues_next: bool = False
    continued_prev: bool = False


@dataclass
class _Builder:
    rows: list[PartRow] = field(default_factory=list)
    qid: str | None = None
    stem: list[str] = field(default_factory=list)
    pid: str | None = None
    qtext: list[str] = field(default_factory=list)
    atext: list[str] = field(default_factory=list)
    mode: str = "idle"  # idle | question | answer | leading
    leading: list[str] = field(default_factory=list)
    has_part_line: bool = False

    def flush_part(self) -> None:
        if self.mode == "idle":
            return
        if not self.qtext and not self.atext and not self.stem:
            self.mode = "idle"
            return
        stem = " ".join(self.stem).strip()
        own = " ".join(self.qtext).strip()
        if self.pid is not None:
            q = (stem + " " if stem else "") + f"({self.pid}) " + own
        else:
            q = own if own else stem
        self.rows.append(PartRow(
            seq=len(self.rows),
            question_id=self.qid,
            part_id=self.pid,
            question_latex=q.strip(),
            answer_latex="\n".join(self.atext).strip(),
        ))
        self.qtext = []
        self.atext = []
        self.mode = "idle"


def parse_structure(lines: list[str]) -> list[PartRow]:
    b = _Builder()
    for raw in lines:
        line = raw.rstrip()
        if not line.strip():
            continue
        m_item = ITEM_RE.match(line)
        m_part = PART_RE.match(line) if not m_item else None
        m_sol = SOLUTION_RE.match(line) if not (m_item or m_part) else None

        if m_item:
            b.flush_part()
            b.qid = m_item.group(1)
            b.stem = []
            b.pid = None
            b.has_part_line = False
            rest = m_item.group(2).strip()
            b.qtext = [rest] if rest else []
            b.mode = "question"
        elif m_part:
            # New lettered part.  At top of turn with no item seen →
            # question_id stays None and the linker inherits it.
            if (
                not b.has_part_line
                and b.pid is None
                and b.mode == "question"
                and not b.atext
            ):
                # question text before the first part line is the shared
                # stem, repeated into each part (prompts/extraction.md:53)
                # — no separate parent row is emitted.
                if b.qtext:
                    b.stem = [" ".join(b.qtext).strip()]
                b.qtext = []
                b.mode = "idle"
            b.flush_part()
            b.has_part_line = True
            b.pid = m_part.group(1)
            rest = m_part.group(2).strip()
            b.qtext = [rest] if rest else []
            b.mode = "question"
        elif m_sol:
            marker, rest = m_sol.group(1), m_sol.group(2).strip()
            b.atext = [marker + (" " + rest if rest else "")]
            b.mode = "answer"
        else:
            if b.mode == "question":
                if b.has_part_line and b.pid is None:
                    b.stem.append(line.strip())
                else:
                    b.qtext.append(line.strip())
            elif b.mode == "answer":
                b.atext.append(line.strip())
            elif b.mode == "idle" and not b.rows:
                # unmarked leading text → continuation fragment
                b.leading.append(line.strip())
                b.mode = "leading"
            elif b.mode == "leading":
                b.leading.append(line.strip())
            else:
                # unmarked text between structures: treat as answer tail
                b.atext.append(line.strip())
                b.mode = "answer"

    # leading fragment (continuation candidate) is emitted FIRST
    rows: list[PartRow] = []
    if b.leading:
        rows.append(PartRow(
            seq=0, question_id=None, part_id=None,
            question_latex="", answer_latex="\n".join(b.leading).strip(),
            continued_prev=True,
        ))
    if b.mode == "leading":
        b.mode = "idle"
    b.flush_part()
    for r in b.rows:
        r.seq = len(rows)
        rows.append(r)

    # continuation flag on the LAST part of the turn
    if rows:
        last = rows[-1]
        body = last.answer_latex.rstrip()
        if body and not body.endswith(_TERMINAL):
            last.continues_next = True
    return rows
