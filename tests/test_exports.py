"""File-tree export sink: reference `_export/` artifact bytes."""

import os

import pyarrow as pa

from ocr_ray.oracle import extract_table
from ocr_ray.sinks.exports import url_slug, write_doc_exports
from ocr_ray.synth import rows_for_range


def test_url_slug_safe_and_unique():
    a = url_slug("https://host0.example/p/1")
    b = url_slug("https://host0.example/p/1?x=2")
    assert a != b
    assert "/" not in a and ":" not in a


def test_doc_export_bytes(tmp_path):
    golden = extract_table(rows_for_range(0, 200)).to_pylist()
    ocr_doc = next(r for r in golden if r["branch"] == "ocr" and not r["error"] and r["n_pages"] > 1)
    doc_dir = str(tmp_path / "doc")
    files = write_doc_exports(
        ocr_doc, doc_dir, ("txt", "txt_delimited", "csv", "xml", "hocr")
    )
    assert set(files) == {"_txt.txt", "_txt_delimited.txt", "_index.csv",
                         "_xml.xml", "_hocr.hocr"}
    txt = open(os.path.join(doc_dir, "_txt.txt"), encoding="utf-8", newline="").read()
    # W1 parity: the txt file content IS the text column
    assert txt == ocr_doc["text"]
    delim = open(os.path.join(doc_dir, "_txt_delimited.txt"), encoding="utf-8", newline="").read()
    assert delim.startswith("----- PAGE 0001 -----\n\n")
    assert f"----- PAGE {ocr_doc['n_pages']:04d} -----" in delim
    csv_text = open(os.path.join(doc_dir, "_index.csv"), encoding="utf-8", newline="").read()
    assert csv_text.startswith("Palavra,Ocorrências,Páginas\r\n")
    alto = open(os.path.join(doc_dir, "_xml.xml"), encoding="utf-8", newline="").read()
    assert "<TextBlock" in alto and "{blocks}" not in alto

    # hOCR re-parses to the same spans (round trip through the export)
    from ocr_ray.kernels.hocr import parse_hocr

    hocr_docs = open(os.path.join(doc_dir, "_hocr.hocr"), encoding="utf-8", newline="").read()
    assert hocr_docs.count('class="ocr_page"') == ocr_doc["n_pages"]


def test_html_doc_txt_export(tmp_path):
    golden = extract_table(rows_for_range(0, 50)).to_pylist()
    html_doc = next(r for r in golden if r["branch"] == "html" and not r["error"])
    files = write_doc_exports(html_doc, str(tmp_path / "h"), ("txt",))
    txt = open(tmp_path / "h" / "_txt.txt", encoding="utf-8", newline="").read()
    assert txt == html_doc["text"]
