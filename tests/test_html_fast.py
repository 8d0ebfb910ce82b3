"""The fast HTML segmenter must be block-stream-identical to the stdlib
segmenter on every input it accepts, and must decline (None) anything
outside its strict subset instead of guessing."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.core import html_extract
from pdf_extractor_spark.core.html_fast import segment_fast
from pdf_extractor_spark.gen.transcripts import generate_transcripts


def _stdlib_blocks(html: str):
    seg = html_extract._Segmenter()
    seg.feed(html)
    seg.close()
    return seg.blocks


def _canon(blocks):
    return [
        (b.tag, "".join(b.parts), b.chars, b.link_chars) for b in blocks
    ]


def test_fast_equals_stdlib_on_full_corpus():
    pdf = generate_transcripts(300, seed=12)
    html_turns = [t for t in pdf["text"] if t.lstrip().startswith("<!DOCTYPE")]
    assert len(html_turns) > 100
    accepted = 0
    for t in html_turns:
        fast = segment_fast(t)
        if fast is None:
            continue
        accepted += 1
        assert _canon(fast) == _canon(_stdlib_blocks(t))
    # the corpus is machine HTML — the fast path must cover ~all of it
    assert accepted / len(html_turns) > 0.99


ADVERSARIAL = [
    "<p>plain</p>",
    "<P>UPPER</P>",
    '<a href="/x">link</a> tail',
    '<a href="/x>y">quoted gt</a>',          # must decline or match
    "<p/>self closed<h1/>heading self</h1>",
    "<script>var x = '<p>not a tag</p>';</script><p>after</p>",
    "<script>x</SCRIPT><p>case closer</p>",
    "<!-- comment --><p>hi</p>",             # must decline (comment)
    "<p>unterminated <a hre",
    "<p>&amp; &lt;entities&gt;</p>",
    "<div><ul><li>a</li><li>b</li></ul></div>",
    "text only, no tags at all",
    "<style>p{}</style><p>styled</p>",
    "<br><p>void tags<hr></p>",
    "<td>cell</td><td>cell2</td>",
    # stdlib exits CDATA at '</\s*script' — the fast path must not skip
    # past a spaced closer and silently drop the text after it
    "<script>x</ script>visible text here</script><p>more</p>",
    "<style>p{}</ style>also visible</style><p>t</p>",
    "<script>x</\tscript><p>tab closer</p>",
]


def test_fast_adversarial_matches_or_declines():
    for html in ADVERSARIAL:
        fast = segment_fast(html)
        if fast is not None:
            assert _canon(fast) == _canon(_stdlib_blocks(html)), html


@settings(max_examples=500, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(list("<>/ab p&;'\"=!-x1")), max_size=80
))
def test_fast_random_tag_soup_matches_or_declines(html):
    fast = segment_fast(html)
    if fast is not None:
        assert _canon(fast) == _canon(_stdlib_blocks(html))
