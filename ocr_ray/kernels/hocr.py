"""hOCR → paragraph/line/word tree parser.

Semantic parity with the reference parser
(/root/reference/server/src/utils/parse_hocr.py:38-115): same title-attribute
regexes, same baseline fallback ``[0, 0]``, same empty-word skipping, same
line-as-word fallback when a line carries no ``ocrx_word`` elements, same
segment-box coordinate offset (``box[i] += segment_box[i % 2]``) and the same
per-word baseline formula
``b = polyval(baseline, (l + r)/2 - line_l) + line_bottom``.

The implementation is original: the reference walks an lxml tree with XPath;
this container has no lxml, so we build a minimal DOM with the stdlib
``html.parser`` and walk it. Output trees are plain Python
``list[par] -> list[line] -> list[word]`` with
``word = {"text", "box": [l,t,r,b], "b", "confidence", "font"?}`` — the
reference's ``_ocr_results`` record shape (parse_hocr.py:88-95).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .textfn import polyval

_BBOX_RE = re.compile(r"bbox((\s+\d+){4})")
_BASELINE_RE = re.compile(r"baseline((\s+[\d.\-]+){2})")
_CONF_RE = re.compile(r"x_wconf\s+(\d+)")
_FONT_RE = re.compile(r"x_font\s+([a-zA-Z_-]+)")

_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node or str
        self.parent = parent

    def text_content(self) -> str:
        out: list[str] = []
        stack = [self]
        # iterative DFS preserving document order
        def walk(node):
            for child in node.children:
                if isinstance(child, str):
                    out.append(child)
                else:
                    walk(child)
        walk(self)
        return "".join(out)

    def iter_desc(self):
        """Yield descendant element nodes in document order (excludes self)."""
        for child in self.children:
            if not isinstance(child, str):
                yield child
                yield from child.iter_desc()


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self._cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self._cur)
        self._cur.children.append(node)
        if tag not in _VOID_TAGS:
            self._cur = node

    def handle_startendtag(self, tag, attrs):
        self._cur.children.append(_Node(tag, dict(attrs), self._cur))

    def handle_endtag(self, tag):
        node = self._cur
        while node is not self.root:
            if node.tag == tag:
                self._cur = node.parent
                return
            node = node.parent
        # unmatched end tag: ignore

    def handle_data(self, data):
        if data:
            self._cur.children.append(data)


def _parse_dom(markup: str) -> _Node:
    builder = _DomBuilder()
    builder.feed(markup)
    builder.close()
    return builder.root


def _find_by_class(node: _Node, cls: str):
    for el in node.iter_desc():
        if el.attrs.get("class") == cls:
            yield el


class HocrParseError(ValueError):
    """Raised when a required title attribute (bbox / x_wconf) is missing —
    the reference raises AttributeError from ``.group`` in the same cases."""


def _require(match, what: str, title: str):
    if match is None:
        raise HocrParseError(f"missing {what} in hOCR title attribute: {title!r}")
    return match


def parse_hocr(hocr: str, segment_box=None) -> list:
    """Parse an hOCR document string into the par/line/word tree."""
    paragraphs = []
    root = _parse_dom(hocr)
    for par_el in _find_by_class(root, "ocr_par"):
        lines = []
        for line_el in _find_by_class(par_el, "ocr_line"):
            title = line_el.attrs.get("title", "")
            linebox = [
                float(v)
                for v in _require(_BBOX_RE.search(title), "bbox", title).group(1).split()
            ]
            baseline_m = _BASELINE_RE.search(title)
            baseline = (
                [float(v) for v in baseline_m.group(1).split()]
                if baseline_m is not None
                else [0.0, 0.0]
            )

            word_els = list(_find_by_class(line_el, "ocrx_word"))
            if not word_els:
                # no word elements: treat the whole line as one word
                # (parity: parse_hocr.py:61-64)
                word_els = [line_el]

            words = []
            for word_el in word_els:
                rawtext = word_el.text_content().strip()
                if rawtext == "":
                    continue
                wtitle = word_el.attrs.get("title", "")
                box_raw = (
                    _require(_BBOX_RE.search(wtitle), "bbox", wtitle).group(1).split()
                )
                confidence = int(
                    _require(_CONF_RE.search(wtitle), "x_wconf", wtitle).group(1)
                )
                font_m = _FONT_RE.search(wtitle)

                if segment_box:
                    # word boxes are relative to the OCR'd segment crop;
                    # shift l/r by segment left, t/b by segment top
                    box = [
                        float(v) + segment_box[i % 2]
                        for i, v in enumerate(box_raw)
                    ]
                else:
                    box = [float(v) for v in box_raw]

                b = polyval(baseline, (box[0] + box[2]) / 2 - linebox[0]) + linebox[3]

                word = {
                    "text": rawtext,
                    "box": box,
                    "b": b,
                    "confidence": confidence,
                }
                if font_m is not None:
                    word["font"] = font_m.group(1)
                words.append(word)

            if words:
                lines.append(words)
        if lines:
            paragraphs.append(lines)
    return paragraphs
