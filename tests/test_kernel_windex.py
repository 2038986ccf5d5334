"""Word-index semantics (parity: export.py:492-530, 204-232)."""

from ocr_ray.kernels.windex import index_to_csv, merge_page_indexes, page_index_words


def w(t):
    return {"text": t, "box": [0.0, 0.0, 1.0, 1.0], "b": 1.0, "confidence": 90}


def test_normalization_and_counts():
    tree = [[[w("Casa,"), w("casa!"), w("«casa»")], [w("Outra")]]]
    idx = page_index_words(tree)
    assert idx == {"casa": 3, "outra": 1}


def test_hyphen_merge_decrements_fragment():
    # "docu-" at line end + "mento" at next line start → "documento" once,
    # fragments absent (FIXTURES.md §3.3)
    tree = [[[w("o"), w("docu-")], [w("mento"), w("fim")]]]
    idx = page_index_words(tree)
    assert idx.get("documento") == 1
    assert "docu-" not in idx and "docu" not in idx
    assert "mento" not in idx
    assert idx.get("o") == 1 and idx.get("fim") == 1


def test_hyphen_flag_survives_paragraph_boundary():
    # reference quirk: the flag is not reset between sections; with the next
    # section starting at line_idx 0, previous word resolves to the *new*
    # section's last line's last word (export.py:503-506 with section[-1])
    tree = [
        [[w("primeiro-")]],
        [[w("segundo")], [w("fim")]],
    ]
    idx = page_index_words(tree)
    # previous_word = section[-1][-1] = "fim"; joined = "fimsegundo"
    assert idx.get("fimsegundo") == 1
    assert idx.get("primeiro-") == 1  # never retracted (count was under raw text)
    assert idx.get("fim") == 1


def test_merge_and_sort_key():
    pages = [{"Zebra": 1, "casa": 2}, {"casa": 1, "Árvore": 1}]
    merged = merge_page_indexes(pages)
    words = [m[0] for m in merged]
    # sort by word.lower()+word
    assert words == sorted(words, key=lambda x: x.lower() + x)
    d = dict(merged)
    assert d["casa"] == {"count": 3, "pages": "1, 2"}
    assert d["Zebra"] == {"count": 1, "pages": "1"}


def test_csv_bytes():
    merged = [("casa", {"count": 3, "pages": "1, 2"})]
    csv_text = index_to_csv(merged)
    lines = csv_text.split("\r\n")
    assert lines[0] == "Palavra,Ocorrências,Páginas"
    assert lines[1] == " "
    # csv module re-quotes the pre-quoted pages field (parity: export.py:228-230)
    assert lines[2] == 'casa,3,"""1, 2"""'
