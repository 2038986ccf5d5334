"""Text assembly + span round-trip (parity: file.py:586-596, export.py:176-185)."""

from ocr_ray.kernels.assemble import (
    doc_text,
    page_text,
    spans_to_tree,
    text_spans,
    tree_to_spans,
    word_count,
)


def w(t):
    return {"text": t, "box": [0.0, 0.0, 1.0, 1.0], "b": 1.0, "confidence": 90}


TREE = [
    [[w("Hello"), w("world")], [w("second"), w("line")]],
    [[w("next"), w("paragraph")]],
]


def test_page_text_join_semantics():
    assert page_text(TREE) == "Hello world\nsecond line\n\nnext paragraph"


def test_page_text_strip():
    assert page_text([]) == ""
    assert page_text([[[w(" x ")]]]) == "x"  # word text arrives pre-stripped; strip() on whole


def test_doc_text_plain_and_delimited():
    pages = ["page one text", "page two text"]
    assert doc_text(pages) == "page one text\n\npage two text\n\n"
    assert (
        doc_text(pages, delimiter=True)
        == "----- PAGE 0001 -----\n\npage one text\n\n----- PAGE 0002 -----\n\npage two text\n\n"
    )


def test_span_roundtrip():
    spans = tree_to_spans(TREE, page_no=3)
    assert all(s["page"] == 3 for s in spans)
    assert [s["par"] for s in spans] == [0, 0, 0, 0, 1, 1]
    assert [s["line"] for s in spans] == [0, 0, 1, 1, 0, 0]
    rebuilt = spans_to_tree(spans)
    assert rebuilt == TREE


def test_text_spans_sentinels():
    spans = text_spans([[["a", "b"], ["c"]]])
    assert spans[0]["box"] == [-1.0, -1.0, -1.0, -1.0]
    assert spans[0]["conf"] == -1
    assert [s["text"] for s in spans] == ["a", "b", "c"]


def test_word_count():
    assert word_count(TREE) == 6
