"""Fast-path HTML segmenter for the strict machine-HTML subset.

The stdlib ``html.parser`` is the tolerant reference tokenizer, but its
char-loop costs ~80% of parse CPU. Most web-scale HTML is machine
generated and falls in a strict subset a single regex scan can tokenize
5-10× faster. This module implements that scan with EXACTLY the same
block semantics as ``html_extract._Segmenter``; inputs outside the strict
subset return ``None`` and the caller falls back to the stdlib path, so
the fast path can never change extraction output — only skip itself.

Gate (conservative by design): no comments, no CDATA/declarations other
than a leading doctype, no ``<`` that doesn't open a well-formed tag, no
unterminated tag at EOF. Equality with the stdlib segmenter over every
gated input is pinned by tests/test_html_fast.py (full corpus sweep +
hypothesis).
"""

from __future__ import annotations

import html as _htmlmod
import re

from pdf_extractor_spark.core.html_extract import (
    BLOCK_TAGS,
    DROP_TAGS,
    _Block,
)

# one token per scan step: a tag, or a text run without '<'
_TOKEN = re.compile(r"<[^<>]*>|[^<]+")
_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)(?:[\s/][^<>]*)?>$")
_DOCTYPE = re.compile(r"^\s*<!doctype[^<>]*>", re.IGNORECASE)

# raw-text elements whose content the stdlib parser treats as CDATA (no
# tag tokenization inside) — the regex scan can't reproduce that, but we
# only ever DROP them, so skipping to the closer is equivalent
_RAWTEXT = {"script", "style"}

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)


def segment_fast(html_text: str) -> list[_Block] | None:
    """→ block stream identical to the stdlib segmenter, or None when the
    input leaves the strict subset."""
    s = html_text
    m = _DOCTYPE.match(s)
    pos = m.end() if m else 0
    n = len(s)

    blocks: list[_Block] = []
    cur = _Block("body")
    drop_depth = 0
    link_depth = 0
    raw_until: str | None = None

    def flush(next_tag: str) -> None:
        nonlocal cur
        if cur.parts:
            blocks.append(cur)
        cur = _Block(next_tag)

    while pos < n:
        if raw_until is not None:
            m_close = re.compile(raw_until, re.IGNORECASE).search(s, pos)
            if m_close is None:
                return None  # unterminated rawtext — bail to stdlib
            pos = m_close.start()
            raw_until = None
            continue
        tok = _TOKEN.match(s, pos)
        if tok is None:
            return None  # stray '<' at EOF etc.
        piece = tok.group(0)
        pos = tok.end()
        if piece[0] == "<":
            # a quoted '>' inside an attribute would have truncated the
            # token — detectable as an odd quote count; bail
            if piece.count('"') % 2 or piece.count("'") % 2:
                return None
            tm = _TAG.match(piece)
            if tm is None:
                return None  # comment/declaration/malformed tag
            closing, tag = tm.group(1) == "/", tm.group(2).lower()
            self_closing = (
                not closing and piece.endswith("/>") and tag not in _VOID
            )
            if not closing and tag in _RAWTEXT and not self_closing:
                # stdlib HTMLParser leaves CDATA at '</\s*tag' — '</ script>'
                # ends the rawtext there.  Matching only the literal
                # '</script' would skip past it and silently drop content,
                # breaking the never-change-output contract; with '\s*' the
                # subsequent _TAG match on '</ script>' fails and we decline
                # to stdlib instead.
                raw_until = rf"</\s*{re.escape(tag)}"
            if tag in DROP_TAGS:
                if closing:
                    drop_depth = max(0, drop_depth - 1)
                elif not self_closing:
                    drop_depth += 1
                continue
            if drop_depth:
                continue
            if tag == "a" and not self_closing:
                if closing:
                    link_depth = max(0, link_depth - 1)
                else:
                    link_depth += 1
            if tag in BLOCK_TAGS:
                # stdlib delivers <tag/> as starttag+endtag
                flush("body" if closing else tag)
                if self_closing:
                    flush("body")
        else:
            if drop_depth:
                continue
            if "&" in piece:
                piece = _htmlmod.unescape(piece)
            if not piece or piece.isspace():
                continue
            cur.parts.append(piece)
            cur.chars += len(piece)
            if link_depth:
                cur.link_chars += len(piece)
    if cur.parts:
        blocks.append(cur)
    return blocks
