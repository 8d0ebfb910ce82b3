"""HTML boilerplate stripping + PDF layout reconstruction + refs."""

import base64
import json

from pdf_extractor_spark.core.html_extract import (
    extract_blocks,
    extract_main_text,
    looks_like_html,
)
from pdf_extractor_spark.core.pdf_layout import (
    cluster_bands,
    decode_boxes,
    extract_layout_text,
    render_reading_order,
)
from pdf_extractor_spark.core.refs import detect_ref, resolve_fixpoint


def test_html_drops_boilerplate_keeps_content():
    html = (
        "<html><body>"
        "<nav><a href='/a'>Home</a><a href='/b'>About</a></nav>"
        "<article><p>This is the main content paragraph with enough "
        "characters to be kept by the classifier.</p></article>"
        "<footer><a href='/c'>contact link</a> <a href='/d'>terms link</a>"
        "</footer></body></html>"
    )
    blocks = extract_blocks(html)
    assert len(blocks) == 1
    assert blocks[0].startswith("This is the main content")


def test_html_link_farm_dropped():
    farm = "".join(f"<a href='/{i}'>some link text here {i}</a> " for i in range(8))
    html = f"<html><body><div>{farm}</div><p>Real body text that is long enough to keep around here.</p></body></html>"
    blocks = extract_blocks(html)
    assert blocks == ["Real body text that is long enough to keep around here."]


def test_html_structural_short_blocks_kept():
    html = "<html><body><p>2.8 Q?</p><p>(a) x</p><p>Solution. y.</p></body></html>"
    assert extract_blocks(html) == ["2.8 Q?", "(a) x", "Solution. y."]


def test_html_malformed_degrades():
    assert isinstance(extract_main_text("<div><p>broken < html <a hre"), str)
    assert extract_main_text("") == ""


def test_looks_like_html():
    assert looks_like_html("<!DOCTYPE html><html></html>")
    assert looks_like_html("x <p>a</p> y</div>")
    assert not looks_like_html("2 < 3 and 4 > 1")
    assert not looks_like_html("plain text")


def _stream(boxes):
    b64 = base64.b64encode(json.dumps({"boxes": boxes}).encode()).decode()
    return f"[PDF-STREAM v1]\n{b64}\n[/PDF-STREAM]"


def test_pdf_reading_order_reconstruction():
    # emitted shuffled; reading order = y bands top→bottom, x within band
    boxes = [
        {"x": 300, "y": 100, "w": 100, "h": 10, "size": 10, "weight": "normal", "text": "right"},
        {"x": 36, "y": 200, "w": 100, "h": 10, "size": 10, "weight": "normal", "text": "below"},
        {"x": 36, "y": 100, "w": 100, "h": 10, "size": 10, "weight": "normal", "text": "left"},
    ]
    assert extract_layout_text(_stream(boxes)) == "left right\nbelow"


def test_pdf_band_clustering_tolerance():
    boxes = [
        {"x": 0, "y": 100.0, "w": 10, "h": 10, "size": 10, "weight": "normal", "text": "a"},
        {"x": 20, "y": 104.0, "w": 10, "h": 10, "size": 10, "weight": "normal", "text": "b"},
        {"x": 0, "y": 140.0, "w": 10, "h": 10, "size": 10, "weight": "normal", "text": "c"},
    ]
    bands = cluster_bands(decode_boxes(_stream(boxes).split("\n")[1]))
    assert len(bands) == 2 and len(bands[0]) == 2


def test_pdf_heading_detection():
    boxes = [
        {"x": 0, "y": 10, "w": 10, "h": 14, "size": 18, "weight": "bold", "text": "Title"},
        {"x": 0, "y": 60, "w": 10, "h": 10, "size": 10, "weight": "normal", "text": "body"},
        {"x": 0, "y": 90, "w": 10, "h": 10, "size": 10, "weight": "normal", "text": "more"},
    ]
    lines = render_reading_order(decode_boxes(_stream(boxes).split("\n")[1]))
    assert lines[0] == ("Title", True)
    assert lines[1][1] is False


def test_pdf_malformed_degrades():
    assert extract_layout_text("[PDF-STREAM v1]\nnot!!base64@@\n[/PDF-STREAM]") == ""
    bad_json = base64.b64encode(b"{not json").decode()
    assert extract_layout_text(f"[PDF-STREAM v1]\n{bad_json}\n[/PDF-STREAM]") == ""
    assert extract_layout_text("no stream here") == ""


def test_detect_ref():
    assert detect_ref("", "Using the result of 2.7 we proceed.") == "2.7"
    assert detect_ref("As in problem 3.4b, we see.", "") == "3.4b"
    assert detect_ref("", "nothing here") is None
    # earliest match across patterns wins
    assert detect_ref("", "see 1.2 and using 9.9") == "1.2"


def test_resolve_fixpoint_chain():
    spans = [
        ("1.1", "QA", "base A."),
        ("1.2", "QB", "Using the result of 1.1 done."),
        ("1.3", "QC", "Using the result of 1.2 done."),
    ]
    out = resolve_fixpoint(spans)
    assert out[0] == ("base A.", False)
    assert out[1][0] == "Using the result of 1.1 done.\n\n[Context 1.1] base A."
    # chained A→B→C inlines transitively within MAX_DEPTH
    assert "base A." in out[2][0] and "[Context 1.2]" in out[2][0]


def test_resolve_missing_target_unchanged():
    out = resolve_fixpoint([("1.1", "", "Using the result of 9.9 x.")])
    assert out[0] == ("Using the result of 9.9 x.", True)


def test_resolve_last_wins_lookup():
    spans = [
        ("2.2", "", "first version."),
        ("2.2", "", "second version."),
        ("2.3", "", "Using the result of 2.2 q.e.d."),
    ]
    out = resolve_fixpoint(spans)
    assert out[2][0].endswith("[Context 2.2] second version.")
