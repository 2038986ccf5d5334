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


_EVT_RE = re.compile(
    r"<(?:p|span|div)\b[^>]*?class=['\"](ocr_par|ocr_line|ocrx_word)['\"][^>]*>",
)
_TITLE_RE = re.compile(r"title=(?:\"([^\"]*)\"|'([^']*)')")
_TAG_STRIP_RE = re.compile(r"<[^>]+>")


def _attr_title(tag_text: str) -> str:
    m = _TITLE_RE.search(tag_text)
    if m is None:
        return ""
    return m.group(1) if m.group(1) is not None else m.group(2)


def _fast_parse(hocr: str, segment_box=None) -> list:
    """Regex fast path for machine-generated hOCR (Tesseract / our writer):
    events for par/line/word start tags are strictly nested, so a flat scan
    reconstructs the tree ~6× faster than the DOM walk. Any structural
    surprise raises and the caller falls back to the DOM parser; equality of
    the two parsers is property-tested (tests/test_properties.py)."""
    import html as _html

    events = list(_EVT_RE.finditer(hocr))
    paragraphs: list = []
    cur_par: list | None = None
    cur_line: list | None = None
    cur_linebox = None
    cur_baseline = None

    def close_line():
        nonlocal cur_line
        if cur_line:
            cur_par.append(cur_line)
        cur_line = None

    def close_par():
        nonlocal cur_par
        close_line()
        if cur_par:
            paragraphs.append(cur_par)
        cur_par = None

    def add_word(tag_text: str, content: str):
        rawtext = _TAG_STRIP_RE.sub("", content)
        rawtext = _html.unescape(rawtext).strip()
        if rawtext == "":
            return
        title = _attr_title(tag_text)
        box_raw = _require(_BBOX_RE.search(title), "bbox", title).group(1).split()
        confidence = int(_require(_CONF_RE.search(title), "x_wconf", title).group(1))
        font_m = _FONT_RE.search(title)
        if segment_box:
            box = [float(v) + segment_box[i % 2] for i, v in enumerate(box_raw)]
        else:
            box = [float(v) for v in box_raw]
        b = polyval(cur_baseline, (box[0] + box[2]) / 2 - cur_linebox[0]) + cur_linebox[3]
        word = {"text": rawtext, "box": box, "b": b, "confidence": confidence}
        if font_m is not None:
            word["font"] = font_m.group(1)
        cur_line.append(word)

    n = len(events)
    for i, evt in enumerate(events):
        cls = evt.group(1)
        if cls == "ocr_par":
            close_par()
            cur_par = []
        elif cls == "ocr_line":
            if cur_par is None:
                raise HocrParseError("line outside paragraph")
            close_line()
            title = _attr_title(evt.group(0))
            cur_linebox = [
                float(v)
                for v in _require(_BBOX_RE.search(title), "bbox", title).group(1).split()
            ]
            bm = _BASELINE_RE.search(title)
            cur_baseline = (
                [float(v) for v in bm.group(1).split()] if bm else [0.0, 0.0]
            )
            cur_line = []
            # line-as-word fallback: no ocrx_word before the next event
            next_is_word = i + 1 < n and events[i + 1].group(1) == "ocrx_word"
            if not next_is_word:
                end = hocr.find("</span>", evt.end())
                if end == -1:
                    raise HocrParseError("unclosed ocr_line")
                content = hocr[evt.end():end]
                if "<span" in content:
                    raise HocrParseError("unexpected nested span in bare line")
                # the line element doubles as the word (parse_hocr.py:61-64)
                add_word(evt.group(0), content)
        elif cls == "ocrx_word":
            if cur_line is None:
                raise HocrParseError("word outside line")
            end = hocr.find("</span>", evt.end())
            if end == -1:
                raise HocrParseError("unclosed ocrx_word")
            content = hocr[evt.end():end]
            if "<span" in content:
                raise HocrParseError("nested span inside word")
            add_word(evt.group(0), content)
    close_par()
    return paragraphs


class HocrParseError(ValueError):
    """Raised when a required title attribute (bbox / x_wconf) is missing —
    the reference raises AttributeError from ``.group`` in the same cases."""


def _require(match, what: str, title: str):
    if match is None:
        raise HocrParseError(f"missing {what} in hOCR title attribute: {title!r}")
    return match


def parse_hocr(hocr: str, segment_box=None) -> list:
    """Parse an hOCR document string into the par/line/word tree.

    Tries the regex fast path first (hOCR is machine-generated and strictly
    nested); any structural surprise falls back to the full DOM walk. Both
    produce identical trees on well-formed input (property-tested)."""
    try:
        return _fast_parse(hocr, segment_box)
    except Exception:
        # the DOM parser is the arbiter for anything the fast path cannot
        # handle — including re-raising the real parity errors (missing
        # bbox / x_wconf) as HocrParseError
        return _dom_parse_hocr(hocr, segment_box)


def _dom_parse_hocr(hocr: str, segment_box=None) -> list:
    """Reference-faithful DOM-walk parser (the fallback / oracle twin)."""
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
