"""HTML main-content extraction heuristics (L4, SURVEY.md §2.10)."""

from ocr_ray.kernels.html_extract import ExtractSettings, extract_blocks, extract_text

PAGE = """<!DOCTYPE html>
<html><head><title>Site title must not leak</title>
<style>body { color: red }</style><script>var x = "script text";</script></head>
<body>
<header><p>Boilerplate site header navigation text here</p></header>
<nav><a href="/">Home</a> <a href="/a">Section A</a> <a href="/b">Section B</a></nav>
<main>
<h1>Article Headline</h1>
<p>This is the first real paragraph of the article body with enough characters to pass.</p>
<p>Short.</p>
<p>Second real paragraph line one<br>line two after the break, also long enough to keep.</p>
<div><a href="/x">link</a> <a href="/y">farm</a> <a href="/z">block full of links only here</a></div>
</main>
<footer><p>Copyright boilerplate footer text that must never appear</p></footer>
</body></html>"""


def test_drops_boilerplate_keeps_content():
    text = extract_text(PAGE)
    assert "Article Headline" in text
    assert "first real paragraph" in text
    assert "Site title" not in text
    assert "script text" not in text
    assert "header navigation" not in text
    assert "Copyright" not in text
    assert "Short." not in text  # below min_text_chars
    assert "link farm" not in text  # link density 1.0


def test_br_makes_lines_and_join_semantics():
    blocks = extract_blocks(PAGE)
    br_par = [b for b in blocks if b and b[0][:1] == ["Second"]]
    assert len(br_par) == 1
    assert len(br_par[0]) == 2  # two lines split at <br>
    text = extract_text(PAGE)
    assert "paragraph line one\nline two after" in text
    assert "Article Headline\n\nThis is the first" in text


def test_settings_threshold():
    lax = ExtractSettings(min_text_chars=1)
    assert "Short." in extract_text(PAGE, lax)


def test_empty_and_garbage():
    assert extract_text("") == ""
    assert extract_text("<<<>>>&&& not html") in ("", "<<<>>>&&& not html")
    # entities decode
    assert extract_text("<p>caf&eacute; com leite e p&atilde;o quentinho demais</p>") == "café com leite e pão quentinho demais"


def test_fast_and_stdlib_extractors_agree_on_corpus():
    """The regex token-scan extractor must match the stdlib-HTMLParser twin
    over the whole synthetic corpus plus adversarial snippets."""
    from ocr_ray.extract_core import route
    from ocr_ray.kernels.html_extract import extract_blocks_stdlib
    from ocr_ray.synth import rows_for_range

    htmls = [
        r["html"].decode("utf-8", errors="replace")
        for r in rows_for_range(0, 1500).to_pylist()
        if route(r["html"]) == "html"
    ]
    assert len(htmls) > 1000
    adversarial = [
        "<p>unclosed <b>bold",
        "<!-- comment <p>inside</p> -->",
        "<script>var a='</div>';</script><p>after script body text long enough to keep</p>",
        "<div data-x='<p>'>attr with angle bracket and long enough text to keep here</div>",
        '<img alt="x > y"/><p>paragraph after angle attr long enough to keep here</p>',
        "<P>UPPERCASE TAGS WITH LONG ENOUGH CONTENT TO PASS THE LENGTH FILTER</P>",
        "<noscript><p>hidden</p></noscript><p>kept visible paragraph long enough here</p>",
    ]
    for h in htmls + adversarial:
        assert extract_blocks(h) == extract_blocks_stdlib(h)


def test_naive_lines_keep_visible_boilerplate():
    """The naive pass keeps nav/header/footer (visible chrome) and all
    short/link-heavy blocks, drops only invisible containers."""
    from ocr_ray.kernels.html_extract import extract_lines_naive

    lines = [line for _, _, line in extract_lines_naive(PAGE)]
    joined = "\n".join(lines)
    assert "Boilerplate site header navigation text here" in lines
    assert "Home Section A Section B" in lines  # nav kept
    assert "Copyright boilerplate footer text that must never appear" in lines
    assert "Short." in lines  # no block scoring
    assert "link farm block full of links only here" in joined
    assert "Site title" not in joined  # head is invisible
    assert "script text" not in joined
    # par/line numbering: <br> split still yields two lines in one par
    br = [(p, ln) for p, ln, line in extract_lines_naive(PAGE)
          if line.startswith(("Second real", "line two"))]
    assert len(br) == 2 and br[0][0] == br[1][0] and (br[0][1], br[1][1]) == (0, 1)


def test_naive_lines_fast_and_stdlib_agree_on_corpus():
    from ocr_ray.extract_core import route
    from ocr_ray.kernels.html_extract import (
        extract_lines_naive,
        extract_lines_naive_stdlib,
    )
    from ocr_ray.synth import rows_for_range

    htmls = [
        r["html"].decode("utf-8", errors="replace")
        for r in rows_for_range(0, 800).to_pylist()
        if route(r["html"]) == "html"
    ]
    assert len(htmls) > 500
    for h in htmls:
        assert extract_lines_naive(h) == extract_lines_naive_stdlib(h)
