"""par/line/word tree → hOCR XML serializer.

Inverse of :mod:`ocr_ray.kernels.hocr`. Used by (a) the deterministic
synthetic-corpus generator (FIXTURES.md §1: fake page payloads carry known
hOCR) and (b) the stub OCR engine's segment path, which re-emits the words
inside a requested box with segment-relative coordinates exactly like a real
Tesseract ``SetRectangle`` call would
(parity: /root/reference/server/src/engines/ocr_tesserocr.py:120-150).
"""

from __future__ import annotations

from xml.sax.saxutils import escape


def tree_to_hocr(tree: list, page_box=(0, 0, 2480, 3508), lang: str = "por") -> str:
    """Serialize a tree into a minimal, spec-shaped hOCR document.

    Line bbox = hull of its word boxes; line baseline = ``0 0`` so the
    parser's ``b`` equals the line bottom (deterministic round-trip).
    """
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<html xmlns="http://www.w3.org/1999/xhtml">\n<body>\n'
        f'<div class="ocr_page" id="page_1" title="bbox '
        f'{page_box[0]} {page_box[1]} {page_box[2]} {page_box[3]}">\n'
    ]
    wid = 0
    for p_i, paragraph in enumerate(tree):
        par_boxes = [w["box"] for line in paragraph for w in line]
        pl = min(b[0] for b in par_boxes)
        pt = min(b[1] for b in par_boxes)
        pr = max(b[2] for b in par_boxes)
        pb = max(b[3] for b in par_boxes)
        parts.append(
            f' <p class="ocr_par" id="par_{p_i + 1}" '
            f'title="bbox {int(pl)} {int(pt)} {int(pr)} {int(pb)}" lang="{lang}">\n'
        )
        for l_i, line in enumerate(paragraph):
            ll = min(w["box"][0] for w in line)
            lt = min(w["box"][1] for w in line)
            lr = max(w["box"][2] for w in line)
            lb = max(w["box"][3] for w in line)
            parts.append(
                f'  <span class="ocr_line" id="line_{p_i + 1}_{l_i + 1}" '
                f'title="bbox {int(ll)} {int(lt)} {int(lr)} {int(lb)}; baseline 0 0">\n'
            )
            for w in line:
                wid += 1
                box = w["box"]
                font = w.get("font")
                font_part = f"; x_font {font}" if font else ""
                parts.append(
                    f'   <span class="ocrx_word" id="word_{wid}" '
                    f'title="bbox {int(box[0])} {int(box[1])} {int(box[2])} {int(box[3])}; '
                    f'x_wconf {int(w["confidence"])}{font_part}">'
                    f"{escape(w['text'])}</span>\n"
                )
            parts.append("  </span>\n")
        parts.append(" </p>\n")
    parts.append("</div>\n</body>\n</html>\n")
    return "".join(parts)
