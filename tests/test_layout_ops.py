"""Layout-routed extraction invariants."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _df(ds):
    return pd.DataFrame(ds.take_all())


def test_auto_layout_reading_order(ray_session):
    from ocr_ray.ops.layout_queries import auto_layout

    df = _df(auto_layout(SF))
    assert len(df) > 100
    # re-crawled urls are processed twice pre-dedup; identical rows collapse
    df = df.drop_duplicates()
    # group ids renumbered per page: "<page+1>.<idx+1>" ascending in (top,left)
    for (_, _), g in df.groupby(["url", "page_no"]):
        g = g.reset_index(drop=True)
        idx = [int(s.split(".")[1]) for s in g["group_id"]]
        assert idx == list(range(1, len(g) + 1))
        tl = list(zip(g["top"], g["left"]))
        assert tl == sorted(tl)


def test_segmented_matches_whole_page_text(ray_session):
    """Segment-routed OCR (SetRectangle + coordinate offset) must reassemble
    the same text as the whole-page path for non-overlapping blocks."""
    from ocr_ray.ops.extraction_queries import extraction_output
    from ocr_ray.ops.layout_queries import segmented_extract
    from ocr_ray.kernels import assemble

    seg = _df(segmented_extract(SF))
    assert (seg["n_segments"] > 0).any()
    whole = {
        r["url"]: r
        for r in extraction_output(SF).take_all()
        if r["branch"] == "ocr" and r["error"] is None
    }
    checked = 0
    for (url, _), g in seg.groupby(["url", "page_no"]):
        if url not in whole:
            continue
        row = whole[url]
        pages: dict[int, list] = {}
        for s in row["spans"]:
            pages.setdefault(s["page"], []).append(s)
        page_no = g["page_no"].iloc[0]
        if page_no not in pages:
            continue
        expect = assemble.page_text(assemble.spans_to_tree(pages[page_no]))
        assert g["page_text"].iloc[0] == expect, url
        checked += 1
    assert checked > 20


def test_pdf_text_layer_math(ray_session):
    from ocr_ray.ops.layout_queries import pdf_text_layer

    df = _df(pdf_text_layer(SF))
    assert len(df) > 500
    assert (df["x"] >= 0).all()
    # y-flip stays on the page (b <= page height)
    assert (df["y"] >= -1).all() and (df["y"] <= 3508 / 2 + 1).all()
    assert (df["horiz_scale"] > 0).all()
