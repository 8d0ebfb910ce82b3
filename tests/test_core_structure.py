"""Structure parser + stitcher unit tests against hand-built fixtures."""

from pdf_extractor_spark.core.structure import parse_qa_id, parse_structure
from pdf_extractor_spark.core.stitch import LinkedRow, link_ids, stitch


def _rows(*specs):
    out = []
    for i, s in enumerate(specs):
        out.append(LinkedRow(
            conv_id="c", turn_idx=s.get("t", i), seq=s.get("seq", 0),
            question_id=s.get("qid"), part_id=s.get("pid"),
            question_latex=s.get("q", ""), answer_latex=s.get("a", ""),
            continues_next=s.get("cn", False),
            continued_prev=s.get("cp", False),
        ))
    return out


def test_parse_qa_id():
    assert parse_qa_id("2.18a") == (2.0, 18.0, "a")
    assert parse_qa_id("2.18") == (2.0, 18.0, "")
    assert parse_qa_id(" 10.15c ") == (10.0, 15.0, "c")
    assert parse_qa_id("weird") == (0.0, 0.0, "weird")
    # numeric, not lexicographic: 2.9 < 2.10 (CLAUDE.md:151-155)
    assert parse_qa_id("2.9") < parse_qa_id("2.10")
    # parent before sub-parts: 2.18 < 2.18a
    assert parse_qa_id("2.18") < parse_qa_id("2.18a")


def test_parse_single_item():
    rows = parse_structure(["2.7 Show that X.", "Solution. Because Y."])
    assert len(rows) == 1
    r = rows[0]
    assert r.question_id == "2.7" and r.part_id is None
    assert r.question_latex == "Show that X."
    assert r.answer_latex == "Solution. Because Y."
    assert not r.continues_next and not r.continued_prev


def test_parse_multipart_stem_repeated():
    rows = parse_structure([
        "2.8 Common stem.",
        "(a) First part.",
        "Solution. A1.",
        "(b) Second part.",
        "Solution. A2.",
    ])
    assert [r.part_id for r in rows] == ["a", "b"]
    # stem included in EACH part (prompts/extraction.md:53)
    assert rows[0].question_latex == "Common stem. (a) First part."
    assert rows[1].question_latex == "Common stem. (b) Second part."
    # no separate parent row
    assert len(rows) == 2


def test_parse_part_at_top_inherits_nothing_locally():
    rows = parse_structure(["(c) Extra part.", "Solution. A3."])
    assert len(rows) == 1
    assert rows[0].question_id is None and rows[0].part_id == "c"


def test_parse_continuation_fragment():
    rows = parse_structure(["unmarked continuation text", "more of it."])
    assert len(rows) == 1
    assert rows[0].continued_prev and rows[0].question_id is None
    assert rows[0].answer_latex == "unmarked continuation text\nmore of it."


def test_continues_next_flag_on_unterminated_answer():
    rows = parse_structure(["3.1 Q.", "Solution. unfinished and"])
    assert rows[-1].continues_next
    rows = parse_structure(["3.1 Q.", "Solution. finished."])
    assert not rows[-1].continues_next


def test_link_ids_part_at_top():
    rows = _rows(
        {"t": 1, "qid": "2.17", "pid": "a", "q": "x", "a": "y"},
        {"t": 2, "pid": "b", "q": "z", "a": "w"},
    )
    link_ids(rows)
    # (b) at top of next turn belongs to 2.17, not a later id
    assert rows[1].question_id == "2.17"


def test_stitch_two_turn_merge():
    rows = _rows(
        {"t": 1, "qid": "2.5", "q": "Q", "a": "A1", "cn": True},
        {"t": 2, "a": "A2", "cp": True},
    )
    spans = stitch(rows)
    assert len(spans) == 1
    s = spans[0]
    assert s.answer_latex == "A1\n\nA2"        # pipeline.py:59
    assert s.question_latex == "Q"             # empty fragment q not appended
    assert s.turn_range == (1, 2)
    assert s.span_id == "2.5"


def test_stitch_three_chain():
    rows = _rows(
        {"t": 1, "qid": "2.6", "q": "Q", "a": "A1", "cn": True},
        {"t": 2, "a": "A2", "cp": True, "cn": True},   # chain (pipeline.py:67)
        {"t": 3, "a": "A3", "cp": True},
    )
    spans = stitch(rows)
    assert len(spans) == 1
    assert spans[0].answer_latex == "A1\n\nA2\n\nA3"
    assert spans[0].n_fragments == 3
    assert spans[0].turn_range == (1, 3)


def test_stitch_question_append_if_different():
    rows = _rows(
        {"t": 1, "qid": "2.6", "q": "Q", "a": "A1", "cn": True},
        {"t": 2, "q": "Q2", "a": "A2", "cp": True},
    )
    spans = stitch(rows)
    assert spans[0].question_latex == "Q Q2"   # pipeline.py:54-57
    rows = _rows(
        {"t": 1, "qid": "2.6", "q": "Q", "a": "A1", "cn": True},
        {"t": 2, "q": "Q", "a": "A2", "cp": True},
    )
    assert stitch(rows)[0].question_latex == "Q"  # dedup guard (:55-57)


def test_stitch_no_merge_without_flags():
    # gap in turns → no merge
    rows = _rows(
        {"t": 1, "qid": "2.6", "a": "A1", "cn": True},
        {"t": 3, "a": "A2", "cp": True},
    )
    assert len(stitch(rows)) == 2
    # missing continues_next → no merge
    rows = _rows(
        {"t": 1, "qid": "2.6", "a": "A1"},
        {"t": 2, "a": "A2", "cp": True},
    )
    assert len(stitch(rows)) == 2


def test_standalone_fallback_id():
    rows = _rows({"t": 7, "a": "hello there."})
    assert stitch(rows)[0].span_id == "t7"
