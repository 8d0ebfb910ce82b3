"""Deterministic PDF-style layout analysis over embedded byte-streams.

The rebuild's analog of the reference's page rendering + bbox clustering
(/root/reference/src/pdf_processor.py:35-61 render, :248-325 agglomerative
bbox merge with tolerance, :320-322 min-size filter): a turn's ``text`` may
carry an embedded base64 layout stream of positioned text boxes; we decode
it inside the Arrow batch, cluster boxes into y-bands (1-D sweep — the
sorted-sweep closed form of the reference's pairwise merge-until-fixpoint),
detect headings by font size/weight, and reconstruct reading order
(top→bottom bands, left→right within a band).

Stream format (defined by this engine's synthetic corpus, FIXTURES.md §1.3):

    [PDF-STREAM v1]
    <base64 of JSON {"boxes": [{"x","y","w","h","size","weight","text"}...]}>
    [/PDF-STREAM]

Malformed payloads (bad base64, bad JSON, missing keys) degrade to an empty
extraction, mirroring /root/reference/src/llm_extractor.py:103-106.
"""

from __future__ import annotations

import base64
import binascii
import json
import re

STREAM_RE = re.compile(
    r"\[PDF-STREAM v1\]\s*(.*?)\s*\[/PDF-STREAM\]", re.DOTALL
)

BAND_TOL = 6.0          # vertical merge tolerance (pts), ≙ merge_distance
HEADING_SIZE_RATIO = 1.3  # band is a heading if size ≥ ratio × median size
MIN_BOX_CHARS = 1


def find_stream(text: str) -> str | None:
    m = STREAM_RE.search(text)
    return m.group(1) if m else None


def decode_boxes(b64: str) -> list[dict]:
    try:
        raw = base64.b64decode(b64, validate=True)
        data = json.loads(raw.decode("utf-8"))
        boxes = data["boxes"]
    except (binascii.Error, ValueError, KeyError, TypeError):
        return []
    out = []
    for b in boxes:
        try:
            t = str(b["text"])
            if len(t.strip()) < MIN_BOX_CHARS:
                continue
            out.append({
                "x": float(b["x"]), "y": float(b["y"]),
                "w": float(b.get("w", 0.0)), "h": float(b.get("h", 10.0)),
                "size": float(b.get("size", 10.0)),
                "weight": str(b.get("weight", "normal")),
                "text": t,
            })
        except (KeyError, TypeError, ValueError):
            continue
    return out


def cluster_bands(boxes: list[dict]) -> list[list[dict]]:
    """1-D sweep clustering on y: a box joins the open band if its top edge
    is within BAND_TOL of the band's running bottom edge.  Equivalent to the
    reference's overlap-with-tolerance fixpoint merge restricted to the y
    axis, but single-pass (sorted sweep ≡ fixpoint for 1-D intervals)."""
    if not boxes:
        return []
    ordered = sorted(boxes, key=lambda b: (b["y"], b["x"], b["text"]))
    bands: list[list[dict]] = []
    cur: list[dict] = [ordered[0]]
    cur_bottom = ordered[0]["y"] + ordered[0]["h"]
    for b in ordered[1:]:
        if b["y"] <= cur_bottom + BAND_TOL:
            cur.append(b)
            cur_bottom = max(cur_bottom, b["y"] + b["h"])
        else:
            bands.append(cur)
            cur = [b]
            cur_bottom = b["y"] + b["h"]
    bands.append(cur)
    return bands


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    n = len(s)
    if n == 0:
        return 0.0
    mid = n // 2
    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def render_reading_order(boxes: list[dict]) -> list[tuple[str, bool]]:
    """→ [(line_text, is_heading)] in reading order."""
    bands = cluster_bands(boxes)
    if not bands:
        return []
    med = _median([b["size"] for b in boxes])
    lines: list[tuple[str, bool]] = []
    for band in bands:
        row = sorted(band, key=lambda b: (b["x"], b["y"], b["text"]))
        text = " ".join(b["text"] for b in row)
        heading = med > 0 and all(
            b["size"] >= HEADING_SIZE_RATIO * med or b["weight"] == "bold"
            for b in row
        )
        lines.append((text, heading))
    return lines


def extract_layout_text(payload: str) -> str:
    """Full path: find stream → decode → band-cluster → reading order."""
    b64 = find_stream(payload)
    if b64 is None:
        return ""
    lines = render_reading_order(decode_boxes(b64))
    return "\n".join(t for t, _ in lines)


def looks_like_pdf(text: str) -> bool:
    return "[PDF-STREAM v1]" in text
