"""Deterministic synthetic transcripts corpus (FIXTURES.md §1).

Schema = BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.

Every conversation is generated from a per-conversation RNG seeded by
``(seed, conv index)`` so output is independent of generation order and of
the total corpus size — conv ``c0042`` is byte-identical at every scale.

Payload classes covered (FIXTURES.md §1 list):
plain text · boilerplate-laden HTML · embedded PDF layout streams ·
cross-turn 2- and 3-chain spans · multi-part items with stems ·
part-at-top inheritance · cross-references incl. chained A→B→C ·
unicode math · malformed payloads · one skew conversation.
"""

from __future__ import annotations

import base64
import json
import random
from datetime import datetime, timedelta

import pandas as pd

_WORDS = (
    "convex set function the show that prove we have for all since norm "
    "follows bounded affine halfspace matrix vector positive definite "
    "therefore implies consider let define obtain holds inequality linear "
    "combination intersection closed open interior boundary feasible"
).split()

_UNICODE_SNIPPETS = [
    "for all x ∈ ℝ we have α ≤ β",
    "hence Σ λᵢ → ∞ and ∇f ⪰ 0",
    "with μ ≥ 0, θ ∈ [0,1] and A ⊆ ℝ",
    "so π · ρ ≠ ∅ and ∀ε ∃δ",
]

_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _para(rng: random.Random, n_sent: int, terminal: bool = True) -> str:
    parts = []
    for i in range(n_sent):
        s = _sentence(rng, rng.randint(6, 14))
        s = s[0].upper() + s[1:]
        if i < n_sent - 1 or terminal:
            s += "."
        parts.append(s)
    return " ".join(parts)


def _maybe_unicode(rng: random.Random, text: str) -> str:
    if rng.random() < 0.35:
        return text + " " + rng.choice(_UNICODE_SNIPPETS)
    return text


def _html_wrap(rng: random.Random, content_lines: list[str]) -> str:
    nav = "".join(
        f'<li><a href="/{w}">{w.title()}</a></li>'
        for w in rng.sample(_WORDS, 5)
    )
    farm = "".join(
        f'<a href="/l/{i}">{_sentence(rng, 2)}</a> · ' for i in range(6)
    )
    body = "".join(f"<p>{ln}</p>" for ln in content_lines)
    ad = f"<div>{_sentence(rng, 2)}</div>"
    return (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<style>p{margin:0}</style><script>var x=1;</script></head>"
        f"<body><nav><ul>{nav}</ul></nav>"
        f"<aside>{farm}</aside>"
        f"<article>{body}</article>"
        f"{ad}"
        f"<footer>{farm}© 2026 example</footer></body></html>"
    )


def _pdf_wrap(rng: random.Random, content_lines: list[str]) -> str:
    boxes = []
    y = 40.0
    for ln in content_lines:
        heading = bool(ln and ln[0].isdigit() and "." in ln[:6])
        boxes.append({
            "x": 36.0 + rng.random() * 2, "y": y,
            "w": 520.0, "h": 14.0 if heading else 11.0,
            "size": 16.0 if heading else 10.0,
            "weight": "bold" if heading else "normal",
            "text": ln,
        })
        y += (24.0 if heading else 18.0)
    # shuffled emission order exercises reading-order reconstruction
    rng.shuffle(boxes)
    b64 = base64.b64encode(
        json.dumps({"boxes": boxes}).encode("utf-8")
    ).decode("ascii")
    return f"preamble noise\n[PDF-STREAM v1]\n{b64}\n[/PDF-STREAM]\ntrailer"


def _item_lines(
    rng: random.Random, qid: str, n_parts: int, unfinished: bool,
    ref_to: str | None,
) -> list[str]:
    """Content lines for one item; if unfinished, the LAST part's answer
    ends without terminal punctuation (continues_next analog)."""
    lines = [f"{qid} {_maybe_unicode(rng, _para(rng, rng.randint(1, 2)))}"]
    part_ids = [chr(ord('a') + i) for i in range(n_parts)] if n_parts else [None]
    for j, pid in enumerate(part_ids):
        if pid is not None:
            lines.append(f"({pid}) {_para(rng, 1)}")
        ans = _maybe_unicode(rng, _para(rng, rng.randint(1, 3)))
        if ref_to and j == 0:
            ans = f"Using the result of {ref_to} we proceed. " + ans
        last = j == len(part_ids) - 1
        if unfinished and last:
            ans = ans.rstrip(".") + " and"  # no terminal punctuation
        sol = "\\textbf{Solution.}" if rng.random() < 0.4 else "Solution."
        lines.append(f"{sol} {ans}")
    return lines


def _wrap(rng: random.Random, lines: list[str], style: str) -> str:
    if style == "html":
        return _html_wrap(rng, lines)
    if style == "pdf":
        return _pdf_wrap(rng, lines)
    return "\n".join(lines)


def _conv(rng: random.Random, conv_id: str, n_items: int, skew: bool) -> list[dict]:
    chapter = rng.randint(1, 9)
    turns: list[dict] = []
    t = 0

    def push(text: str, role: str, tool: str = "") -> None:
        nonlocal t
        turns.append({
            "conv_id": conv_id, "turn_idx": t, "role": role,
            "text": text, "tool": tool,
            "ts": _BASE_TS + timedelta(minutes=t),
        })
        t += 1

    push(f"Please extract chapter {chapter} problems.", "user")
    prev_qid: str | None = None
    for i in range(n_items):
        qid = f"{chapter}.{i + 1}"
        style = rng.choice(["plain", "html", "pdf", "plain"])
        n_parts = rng.choice([0, 0, 2, 3])
        # cross-reference: sometimes to the previous item (chained chains
        # arise naturally: i → i-1 → i-2)
        ref_to = prev_qid if (prev_qid and rng.random() < 0.3) else None
        # span shape: 1-, 2- or 3-turn answer
        chain = rng.choice([1, 1, 1, 2, 3]) if not skew else rng.choice([1, 2])
        lines = _item_lines(rng, qid, n_parts, unfinished=chain > 1, ref_to=ref_to)
        push(_wrap(rng, lines, style), "assistant")
        for c in range(1, chain):
            last = c == chain - 1
            cont = _para(rng, rng.randint(1, 2), terminal=last)
            if not last:
                cont = cont.rstrip(".") + " then"
            push(_wrap(rng, [cont], style if style != "pdf" else "plain"),
                 "assistant")
        if rng.random() < 0.15:
            push(f"lookup({qid})", "tool", tool="search")
        if n_parts and rng.random() < 0.25:
            # part-at-top turn: extra lettered part with NO item id — must
            # inherit qid via forward fill (prompts/extraction.md:82-90)
            extra = chr(ord('a') + n_parts)
            lines2 = [f"({extra}) {_para(rng, 1)}",
                      f"Solution. {_para(rng, rng.randint(1, 2))}"]
            push(_wrap(rng, lines2, "plain"), "assistant")
        prev_qid = qid
    if rng.random() < 0.2:
        # malformed payloads must degrade, not error
        push("[PDF-STREAM v1]\nnot!!base64@@\n[/PDF-STREAM]", "assistant")
        push("<html><div><p>broken < html <a hre", "assistant")
    return turns


def generate_transcripts(
    n_convs: int = 20, seed: int = 42, skew_conv_turns: int = 0
) -> pd.DataFrame:
    """Deterministic corpus; ``skew_conv_turns`` > 0 appends one
    mega-conversation with ~that many turns (FIXTURES.md §1.9)."""
    rows: list[dict] = []
    for k in range(n_convs):
        rng = random.Random(seed * 1_000_003 + k)
        rows.extend(_conv(rng, f"c{k:05d}", n_items=rng.randint(3, 8), skew=False))
    if skew_conv_turns > 0:
        rng = random.Random(seed * 1_000_003 - 1)
        items = max(1, skew_conv_turns // 3)
        rows.extend(_conv(rng, "c_skew", n_items=items, skew=True))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
