"""Text assembly + tree↔span conversion.

``page_text`` is the byte-exact analogue of the reference's ``json_to_text``
(/root/reference/server/src/utils/file.py:586-596): words joined with a
single space, lines with ``"\\n"``, paragraphs with ``"\\n\\n"``, whole page
``.strip()``'d.

``doc_text`` reproduces the TXT export file bytes
(/root/reference/server/src/utils/export.py:149-187): pages ordered
numerically, each page's text followed by ``"\\n\\n"``, delimited variant
prefixing ``----- PAGE %04d -----\\n\\n``.

The Arrow-facing span representation flattens the 3-deep tree into word rows
carrying ``(par, line)`` indices; reconstruction is lossless because word
order within a line and line/paragraph numbering are explicit.
"""

from __future__ import annotations

SENTINEL_BOX = [-1.0, -1.0, -1.0, -1.0]
SENTINEL_B = -1.0
SENTINEL_CONF = -1


def page_text(tree: list) -> str:
    """par/line/word tree → text. Parity: file.py:586-596 (json_to_text)."""
    pars = []
    for paragraph in tree:
        pars.append("\n".join(" ".join(w["text"] for w in line) for line in paragraph))
    return "\n\n".join(pars).strip()


def page_text_strs(tree: list) -> str:
    """par/line/word text, texts-only nested-list variant of
    :func:`page_text` (same bytes; words are plain strings)."""
    pars = []
    for paragraph in tree:
        pars.append("\n".join(" ".join(line) for line in paragraph))
    return "\n\n".join(pars).strip()


def doc_text(page_texts: list[str], delimiter: bool = False) -> str:
    """Concatenate per-page texts exactly as the TXT export writes them.

    Parity: export.py:176-185 — every page contributes ``text + "\\n\\n"``;
    the delimited variant prefixes ``----- PAGE %04d -----\\n\\n``.
    """
    parts = []
    for i, text in enumerate(page_texts):
        if delimiter:
            parts.append(f"----- PAGE {(i + 1):04d} -----\n\n")
        parts.append(text + "\n\n")
    return "".join(parts)


def tree_to_spans(tree: list, page_no: int = 0) -> list[dict]:
    """Flatten a par/line/word tree into span records.

    Span = ``{text, box:[l,t,r,b], b, conf, font, page, par, line}`` —
    the word record of parse_hocr.py:88-95 plus explicit position indices so
    the tree survives any shuffle.
    """
    spans = []
    for par_idx, paragraph in enumerate(tree):
        for line_idx, line in enumerate(paragraph):
            for word in line:
                spans.append(
                    {
                        "text": word["text"],
                        "box": [float(v) for v in word["box"]],
                        "b": float(word["b"]),
                        "conf": int(word["confidence"]),
                        "font": word.get("font"),
                        "page": page_no,
                        "par": par_idx,
                        "line": line_idx,
                    }
                )
    return spans


def spans_to_tree(spans: list[dict]) -> list:
    """Rebuild the par/line/word tree of ONE page from span records.

    Spans must belong to a single page; ordering within a line is the list
    order (stable), par/line indices may be sparse.
    """
    tree: list = []
    cur_par = cur_line = None
    par_list: list = []
    line_list: list = []
    for span in spans:
        if span["par"] != cur_par:
            par_list = []
            tree.append(par_list)
            cur_par = span["par"]
            cur_line = None
        if span["line"] != cur_line:
            line_list = []
            par_list.append(line_list)
            cur_line = span["line"]
        word = {
            "text": span["text"],
            "box": list(span["box"]),
            "b": span["b"],
            "confidence": span["conf"],
        }
        if span.get("font") is not None:
            word["font"] = span["font"]
        line_list.append(word)
    return tree


def text_spans(paragraphs: list[list[list[str]]], page_no: int = 0) -> list[dict]:
    """Span records for the HTML branch: real par/line/word indices, sentinel
    geometry (no pixel coordinates exist for DOM text)."""
    spans = []
    for par_idx, par in enumerate(paragraphs):
        for line_idx, line in enumerate(par):
            for word in line:
                spans.append(
                    {
                        "text": word,
                        "box": list(SENTINEL_BOX),
                        "b": SENTINEL_B,
                        "conf": SENTINEL_CONF,
                        "font": None,
                        "page": page_no,
                        "par": par_idx,
                        "line": line_idx,
                    }
                )
    return spans


def word_count(tree: list) -> int:
    """Total words in a page tree.

    Parity: /root/reference/server/src/utils/file.py:536-549.
    """
    return sum(len(line) for paragraph in tree for line in paragraph)
