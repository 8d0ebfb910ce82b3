"""Deterministic HTML main-content extraction (boilerplate stripping).

jusText/Readability-style block classification — link-density +
text-density over a block segmentation — built on the stdlib
``html.parser`` (no lxml in this environment).  This replaces the
reference's per-page vision-LLM extraction call
(/root/reference/src/models/base.py:11-22) with a pure function, which is
what makes the rebuild deterministic and embarrassingly parallel.

Semantics (fixed constants, part of the oracle contract):

- hard-drop subtrees: ``script style noscript template nav footer header
  aside form iframe svg``;
- block boundaries: ``p div h1..h6 li td th dd dt pre blockquote section
  article main table ul ol tr body``;
- a block is *content* iff
    * it is a heading (``h1..h6``) with ≥3 chars and link_density < 0.5, or
    * it has ≥ MIN_BLOCK_CHARS (25) chars and link_density < 0.33, or
    * it has ≥10 chars, link_density == 0 and stopword-ish density high
      (short connective lines between paragraphs);
- block text is whitespace-collapsed; kept blocks join with ``"\\n"``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

DROP_TAGS = frozenset(
    "script style noscript template nav footer header aside form iframe svg".split()
)
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th dd dt pre blockquote "
    "section article main table ul ol tr body".split()
)
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33

_WS = re.compile(r"\s+")

# Small function-word list for the short-block salvage rule (public
# stopword heuristic, cf. jusText's stoplist approach).
_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with "
    "for on as by at from we you they he she not but if then so".split()
)

# Short blocks that are structural markers of the extraction domain (item
# ids, lettered parts, Solution markers) are content regardless of length —
# the deterministic analog of jusText's neargood-by-context rule.
_STRUCTURAL = re.compile(r"^(\d+\.\d+\b|\([a-z]\)\s|\\textbf\{Solution\.\}|Solution\.)")


class _Block:
    __slots__ = ("tag", "chars", "link_chars", "parts")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.chars = 0
        self.link_chars = 0
        self.parts: list[str] = []


class _Segmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block("body")
        self._drop_depth = 0
        self._link_depth = 0

    def _flush(self, next_tag: str) -> None:
        if self._cur.parts:
            self.blocks.append(self._cur)
        self._cur = _Block(next_tag)

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush(tag)

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush("body")

    def handle_data(self, data):
        if self._drop_depth:
            return
        if not data or data.isspace():
            return
        self._cur.parts.append(data)
        n = len(data)
        self._cur.chars += n
        if self._link_depth:
            self._cur.link_chars += n

    def close(self):  # flush trailing text
        super().close()
        if self._cur.parts:
            self.blocks.append(self._cur)
            self._cur = _Block("body")


def _block_text(b: _Block) -> str:
    return _WS.sub(" ", "".join(b.parts)).strip()


def _stopword_density(text: str) -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    return sum(1 for w in words if w in _STOPWORDS) / len(words)


def _is_content(b: _Block, text: str) -> bool:
    n = len(text)
    if n == 0:
        return False
    ld = (b.link_chars / b.chars) if b.chars else 0.0
    if b.tag in HEADING_TAGS:
        return n >= 3 and ld < 0.5
    if ld < MAX_LINK_DENSITY and _STRUCTURAL.match(text):
        return True
    if n >= MIN_BLOCK_CHARS and ld < MAX_LINK_DENSITY:
        return True
    if n >= 10 and ld == 0.0 and _stopword_density(text) >= 0.3:
        return True
    return False


def extract_blocks(html: str) -> list[str]:
    """Segment HTML into blocks and keep main-content blocks in order.

    Malformed HTML never raises — the stdlib parser is tolerant; total
    failure degrades to an empty extraction, mirroring the reference's
    parse-failure fallback (/root/reference/src/llm_extractor.py:103-106).
    """
    # strict-subset fast tokenizer first (~6× cheaper); it declines —
    # returns None — on anything unusual and the stdlib parser takes over.
    # Block-stream equality between the two is pinned by
    # tests/test_html_fast.py, so this is a pure physical choice.
    from pdf_extractor_spark.core.html_fast import segment_fast

    blocks = None
    try:
        blocks = segment_fast(html)
    except Exception:
        blocks = None
    if blocks is None:
        try:
            seg = _Segmenter()
            seg.feed(html)
            seg.close()
            blocks = seg.blocks
        except Exception:
            return []
    out: list[str] = []
    for b in blocks:
        text = _block_text(b)
        if _is_content(b, text):
            out.append(text)
    return out


def extract_main_text(html: str) -> str:
    """Main content of an HTML payload as newline-joined block texts."""
    return "\n".join(extract_blocks(html))


def looks_like_html(text: str) -> bool:
    """Cheap deterministic payload-kind sniff for the HTML path."""
    head = text[:256].lstrip().lower()
    if head.startswith("<!doctype html") or head.startswith("<html"):
        return True
    # Require at least one opening block tag AND one closing tag anywhere.
    return bool(re.search(r"<(p|div|h[1-6]|ul|ol|table|section|article)\b", text)) \
        and "</" in text
