"""HTML main-content extraction (the graft's L4 branch — new; the reference
has no HTML path, see SURVEY.md §2.10).

Readability/trafilatura-style heuristic over a streaming DOM walk:

1. structural boilerplate subtrees are dropped outright
   (``head/script/style/nav/header/footer/aside/form/...``);
2. text accumulates into blocks at block-level tag boundaries
   (``p/div/h1..h6/li/td/...``), ``<br>`` starting a new *line* within the
   current block;
3. each block is scored by text length and link density
   (chars inside ``<a>`` / total chars); short or link-dominated blocks are
   discarded (headings get a laxer rule).

The output shares the OCR branch's data model: a list of paragraphs, each a
list of lines, each a list of words — so ``assemble.page_text`` produces the
final text with identical join semantics for both branches
(words ``" "``, lines ``"\\n"``, paragraphs ``"\\n\\n"``, strip).

All thresholds live in ``ExtractSettings`` so the scoring is explicit and
testable; defaults follow the published Readability/JusText heuristics
(PAPERS.md), not any proprietary system.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

DROP_TAGS = frozenset(
    {"head", "script", "style", "noscript", "template", "svg", "iframe",
     "form", "button", "select", "option", "nav", "header", "footer",
     "aside", "figure", "object", "embed", "applet", "audio", "video",
     "canvas", "map", "datalist"}
)

BLOCK_TAGS = frozenset(
    {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "dd", "dt",
     "td", "th", "blockquote", "pre", "article", "section", "main",
     "figcaption", "caption", "summary", "details", "body", "table",
     "ul", "ol", "dl", "tr", "hr", "address", "center"}
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Tags whose content a browser never renders as page text. The difference
# vs DROP_TAGS (nav/header/footer/aside/form/...) is exactly the VISIBLE
# boilerplate that per-document heuristics strip by position — and that the
# corpus-frequency pass (extract_lines_naive + ops.extraction_queries.
# boilerplate_line_dedup) strips by repetition instead.
INVISIBLE_TAGS = frozenset(
    {"head", "script", "style", "noscript", "template", "svg", "iframe",
     "object", "embed", "applet", "audio", "video", "canvas", "map",
     "datalist"}
)


@dataclass(frozen=True)
class ExtractSettings:
    """Block-scoring thresholds (jusText/Readability-style)."""

    min_text_chars: int = 25          # non-heading blocks shorter than this drop
    max_link_density: float = 0.5     # non-heading blocks above this drop
    heading_max_link_density: float = 0.66
    keep_headings: bool = True


DEFAULT_SETTINGS = ExtractSettings()


class _Block:
    __slots__ = ("tag", "lines", "chars", "link_chars")

    def __init__(self, tag: str):
        self.tag = tag
        self.lines: list[list[str]] = [[]]
        self.chars = 0
        self.link_chars = 0

    def add_text(self, text: str, in_link: bool) -> None:
        words = text.split()
        if not words:
            return
        self.lines[-1].extend(words)
        n = sum(len(w) for w in words)
        self.chars += n
        if in_link:
            self.link_chars += n

    def newline(self) -> None:
        if self.lines[-1]:
            self.lines.append([])

    @property
    def is_empty(self) -> bool:
        return self.chars == 0

    def word_lines(self) -> list[list[str]]:
        return [line for line in self.lines if line]


class _ContentParser(HTMLParser):
    def __init__(self, drop_tags: frozenset = DROP_TAGS):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block("body")
        self._drop_depth = 0
        self._link_depth = 0
        self._drop_stack: list[str] = []
        self._drop_tags = drop_tags

    def _flush(self, next_tag: str) -> None:
        if not self._cur.is_empty:
            self.blocks.append(self._cur)
        self._cur = _Block(next_tag)

    def handle_starttag(self, tag, attrs):
        if self._drop_depth:
            if tag in self._drop_tags and tag == self._drop_stack[-1]:
                # nested same-tag drop region
                self._drop_stack.append(tag)
                self._drop_depth += 1
            elif tag in self._drop_tags:
                self._drop_stack.append(tag)
                self._drop_depth += 1
            return
        if tag in self._drop_tags:
            self._drop_depth = 1
            self._drop_stack = [tag]
            return
        if tag == "br":
            self._cur.newline()
        elif tag == "a":
            self._link_depth += 1
        elif tag in BLOCK_TAGS:
            self._flush(tag)

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth:
            return
        if tag == "br":
            self._cur.newline()
        elif tag == "hr":
            self._flush("div")

    def handle_endtag(self, tag):
        if self._drop_depth:
            if self._drop_stack and tag == self._drop_stack[-1]:
                self._drop_stack.pop()
                self._drop_depth -= 1
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        elif tag in BLOCK_TAGS:
            self._flush("div")

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._cur.add_text(data, in_link=self._link_depth > 0)

    def finish(self) -> list[_Block]:
        if not self._cur.is_empty:
            self.blocks.append(self._cur)
        return self.blocks


def _keep(block: _Block, settings: ExtractSettings) -> bool:
    density = block.link_chars / block.chars if block.chars else 1.0
    if block.tag in HEADING_TAGS:
        return (
            settings.keep_headings
            and block.chars > 0
            and density < settings.heading_max_link_density
        )
    return block.chars >= settings.min_text_chars and density < settings.max_link_density


# ------------------------------------------------------------ fast tokenizer
#
# Block scoring needs only tag names and text — never attributes — so a
# regex token scan is ~3× faster than the stdlib HTMLParser state machine.
# The stdlib path is kept as the cross-check twin
# (tests/test_kernel_html.py asserts corpus-wide agreement). Agreement is
# guaranteed for well-formed markup; on invalid byte soup (e.g. random
# bytes that happen to sniff as HTML) the two may tokenize differently —
# harmless, because the oracle and the distributed stages both use THIS
# function, so output stays deterministic and self-consistent.

_RAW_TEXT_TAGS = ("script", "style", "noscript", "template")
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"          # comments (unterminated swallows rest)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"                 # doctype / other declarations
    r"|<\?[^>]*>"                # processing instructions
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>])*)>",
    re.S,
)
_RAW_CLOSE = {
    tag: re.compile(f"</{tag}[^>]*>", re.I) for tag in _RAW_TEXT_TAGS
}


class _TokenSink:
    """Re-implements _ContentParser's event handling over the token scan."""

    __slots__ = ("blocks", "_cur", "_drop_depth", "_drop_stack", "_link_depth",
                 "_drop_tags")

    def __init__(self, drop_tags: frozenset = DROP_TAGS):
        self.blocks: list[_Block] = []
        self._cur = _Block("body")
        self._drop_depth = 0
        self._drop_stack: list[str] = []
        self._link_depth = 0
        self._drop_tags = drop_tags

    handle_starttag = _ContentParser.handle_starttag
    handle_startendtag = _ContentParser.handle_startendtag
    handle_endtag = _ContentParser.handle_endtag
    handle_data = _ContentParser.handle_data
    _flush = _ContentParser._flush
    finish = _ContentParser.finish


def _scan(html: str, sink: _TokenSink) -> None:
    import html as _html_mod

    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.search(html, pos)
        if m is None:
            text = html[pos:]
            if text:
                sink.handle_data(_html_mod.unescape(text) if "&" in text else text)
            break
        if m.start() > pos:
            text = html[pos : m.start()]
            sink.handle_data(_html_mod.unescape(text) if "&" in text else text)
        pos = m.end()
        name = m.group(2)
        if name is None:
            continue  # comment / doctype / PI
        tag = name.lower()
        if m.group(1):  # end tag
            sink.handle_endtag(tag)
        else:
            if m.group(3) and m.group(3).rstrip().endswith("/"):  # self-closing
                sink.handle_startendtag(tag, ())
            else:
                sink.handle_starttag(tag, ())
                if tag in _RAW_TEXT_TAGS:
                    # raw-text element: skip content to its closing tag
                    close = _RAW_CLOSE[tag].search(html, pos)
                    if close is None:
                        sink.handle_endtag(tag)
                        break
                    sink.handle_endtag(tag)
                    pos = close.end()


def extract_blocks(html: str, settings: ExtractSettings = DEFAULT_SETTINGS) -> list[list[list[str]]]:
    """HTML string → kept content as paragraphs→lines→words (fast scan)."""
    sink = _TokenSink()
    _scan(html, sink)
    blocks = sink.finish()
    return [b.word_lines() for b in blocks if _keep(b, settings) and b.word_lines()]


def extract_blocks_stdlib(html: str, settings: ExtractSettings = DEFAULT_SETTINGS) -> list[list[list[str]]]:
    """Stdlib-HTMLParser twin of extract_blocks (cross-check oracle)."""
    parser = _ContentParser()
    parser.feed(html)
    parser.close()
    blocks = parser.finish()
    return [b.word_lines() for b in blocks if _keep(b, settings) and b.word_lines()]


def extract_text(html: str, settings: ExtractSettings = DEFAULT_SETTINGS) -> str:
    """HTML string → main-content text with the shared assembly semantics."""
    pars = extract_blocks(html, settings)
    return "\n\n".join("\n".join(" ".join(line) for line in lines) for lines in pars).strip()


def _lines_from_blocks(blocks: list[_Block]) -> list[tuple[int, int, str]]:
    out: list[tuple[int, int, str]] = []
    par_no = 0
    for block in blocks:
        word_lines = block.word_lines()
        if not word_lines:
            continue
        for line_no, words in enumerate(word_lines):
            out.append((par_no, line_no, " ".join(words)))
        par_no += 1
    return out


def extract_lines_naive(html: str) -> list[tuple[int, int, str]]:
    """ALL visible text as (par_no, line_no, line) — no block scoring, and
    only truly invisible containers dropped (INVISIBLE_TAGS), so nav/header/
    footer boilerplate IS included. This is the per-document stage of the
    corpus-frequency boilerplate remover (CCNet-style: lines repeated across
    many documents are template chrome; see ops.extraction_queries.
    boilerplate_line_dedup). Paragraph/line numbering mirrors
    extract_blocks' blocks→word_lines structure."""
    sink = _TokenSink(drop_tags=INVISIBLE_TAGS)
    _scan(html, sink)
    return _lines_from_blocks(sink.finish())


def extract_lines_naive_stdlib(html: str) -> list[tuple[int, int, str]]:
    """Stdlib-HTMLParser twin of extract_lines_naive (cross-check tests)."""
    parser = _ContentParser(drop_tags=INVISIBLE_TAGS)
    parser.feed(html)
    parser.close()
    return _lines_from_blocks(parser.finish())
