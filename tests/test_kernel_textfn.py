"""Scalar helpers (parity citations in ocr_ray/kernels/textfn.py)."""

from ocr_ray.kernels import textfn


def test_page_number_key():
    names = ["doc_10.json", "doc_2.json", "doc_1.json"]
    assert sorted(names, key=textfn.page_number_key) == ["doc_1.json", "doc_2.json", "doc_10.json"]


def test_zip_member_key_casefold_tiebreak():
    names = ["B.png", "a.png", "A.png"]
    assert sorted(names, key=textfn.zip_member_key) == ["A.png", "a.png", "B.png"]


def test_normalize_index_word():
    assert textfn.normalize_index_word("«Casa».,") == "casa"
    assert textfn.normalize_index_word("(why?!)") == "why"


def test_estimate_and_sizes():
    assert textfn.estimate_ocr_minutes(1) == 1
    assert textfn.estimate_ocr_minutes(100) == 3  # ceil(1.76 + 0.2632)
    assert textfn.size_to_units(512) == "512.00 B"
    assert textfn.size_to_units(2048) == "2.00 KB"


def test_basename_extension():
    assert textfn.get_file_basename("a/b/doc.v2.pdf") == "doc.v2"
    assert textfn.get_file_basename("noext") == "noext"
    assert textfn.get_file_extension("doc.v2.pdf") == "pdf"


def test_polyval_and_scale():
    assert textfn.polyval([2.0, 1.0], 3.0) == 7.0
    assert textfn.bbox_scale(300.0, 150, 300) == 150.0


def test_similarity():
    assert textfn.similarity_ratio("abc", "abc") == 1.0
    assert 0 < textfn.similarity_ratio("abcd", "abce") < 1
