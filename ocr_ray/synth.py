"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Every row is a pure function of ``(row_index, seed)`` — generation order,
batching and parallelism cannot change content, so the corpus can be built
either in-process (tests) or via ``ray.data.range(n).map_batches`` (bench
scale) with identical bytes.

Corpus properties (FIXTURES.md):
- skewed host: ``host0`` owns ~30% of rows (skew/shuffle exercise);
- ~5% re-crawled urls: same url + payload, later ``warc_ts``
  (latest-wins dedup exercise, SURVEY.md D1);
- payload mix: majority synthetic HTML (boilerplate + scored content),
  minority fake PDF / image / TIFF / ZIP payloads carrying known hOCR
  (OCR branch), plus edge rows (empty body, garbage bytes, multi-page PDF,
  hyphenated line-break words);
- ``text`` column = noisy crawler rendition (a weak prior, never the target);
- ``lang`` ~ reference-weighted {por, eng, spa, fra, deu}
  (default.json lang=por).
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import PAGES_SCHEMA
from .sources.payloads import build_fake_pdf, build_fake_tiff, build_zip
from .kernels import raster

SEED = 42
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_SYLLABLES = (
    "ca sa do ra mi to ve la por tu es den fi lo mu ne qui zo bar tex "
    "men pa ri ful gar on da pe dra cor ti vel um bra no va lu zes"
).split()

_LANG_WHEEL = ["por", "por", "por", "por", "por", "eng", "eng", "spa", "fra", "deu"]

_BOILER_NAV = (
    '<nav><a href="/">Início</a> <a href="/arquivo">Arquivo</a> '
    '<a href="/sobre">Sobre</a> <a href="/contacto">Contacto</a></nav>'
)
_BOILER_HEADER = "<header><p>Portal de notícias sintético — cabeçalho repetido em todas as páginas</p></header>"
_BOILER_FOOTER = (
    "<footer><p>Copyright 2024 portal sintético todos os direitos reservados "
    "termos privacidade</p></footer>"
)


def _word(rng: random.Random) -> str:
    return "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4)))


def _sentence_words(rng: random.Random, lo: int = 8, hi: int = 18) -> list[str]:
    return [_word(rng) for _ in range(rng.randint(lo, hi))]


def _content_paragraphs(rng: random.Random, n_lo=2, n_hi=6) -> list[list[list[str]]]:
    """paragraphs -> lines -> words of generated content."""
    pars = []
    for _ in range(rng.randint(n_lo, n_hi)):
        lines = [_sentence_words(rng) for _ in range(rng.randint(1, 3))]
        pars.append(lines)
    return pars


# ------------------------------------------------------------------- HTML


def _syndicated_pool() -> list[list[list[str]]]:
    """20 fixed 'wire-service' paragraphs shared across hosts (seeded rng
    independent of the corpus seed) — the cross-document n-gram overlap
    substrate for contamination_check / paragraph_dedup / near-dup ops."""
    rng = random.Random(987654)
    return [
        [_sentence_words(rng, 8, 14) for _ in range(2)] for _ in range(20)
    ]


_SYNDICATED = _syndicated_pool()


def _phone(rng: random.Random) -> str:
    return f"+351 {rng.randrange(100):02d} {rng.randrange(1000):03d} {rng.randrange(10000):04d}"


def _html_payload(rng: random.Random, host: str) -> tuple[bytes, str]:
    pars = _content_paragraphs(rng)
    if rng.random() < 0.08:  # syndicated wire paragraph (cross-host overlap)
        pars.append([list(line) for line in _SYNDICATED[rng.randrange(20)]])
    if rng.random() < 0.10:  # intra-doc repeated paragraph (corpus v3: makes
        # paragraph-level dedup non-vacuous — real pages repeat pull quotes,
        # summaries and teaser blocks inside one document)
        pars.append([list(line) for line in pars[0]])
    if rng.random() < 0.15:  # inline contact email inside main content
        pars[-1].append(["escreva", "para", f"{_word(rng)}@{host}.example"])
    heading = " ".join(_sentence_words(rng, 3, 6)).title()
    body = [
        "<!DOCTYPE html>",
        f"<html><head><title>{heading} — portal</title>",
        "<style>body{margin:0}</style><script>window.tracker=1;</script></head><body>",
        _BOILER_HEADER,
        _BOILER_NAV,
        "<main>",
        f"<h1>{heading}</h1>",
    ]
    for lines in pars:
        body.append("<p>" + "<br>".join(" ".join(ws) for ws in lines) + "</p>")
    if rng.random() < 0.3:
        links = " ".join(
            f'<a href="/t/{i}">{_word(rng)}</a>' for i in range(rng.randint(3, 8))
        )
        body.append(f"<div>{links}</div>")
    if rng.random() < 0.35:  # cross-host "see also" links (host link graph)
        links = " ".join(
            f'<a href="https://host{rng.randrange(50)}.example/p/{rng.randrange(2000)}">'
            f"{_word(rng)}</a>"
            for _ in range(rng.randint(1, 3))
        )
        body.append(f'<div class="seealso">{links}</div>')
    body.append("</main>")
    body.append(_BOILER_FOOTER)
    body.append(
        f"<footer><p>Contacto: {_word(rng)}@{host}.example Tel. {_phone(rng)}</p></footer>"
    )
    body.append("</body></html>")
    crawler_text = " ".join(w for lines in pars for ws in lines for w in ws)
    return "\n".join(body).encode("utf-8"), f"{heading} {crawler_text}"


# -------------------------------------------------------------------- OCR

def _page_tree(rng: random.Random, hyphen: bool = False) -> list:
    """Build a par/line/word tree with grid geometry. Word ``b`` equals the
    line bottom (serializer emits baseline 0 0, so parse round-trips)."""
    tree = []
    y = 100
    for _ in range(rng.randint(1, 3)):
        par = []
        for _ in range(rng.randint(1, 4)):
            words = _sentence_words(rng, 4, 9)
            x = 100
            line = []
            bottom = y + 46
            for w in words:
                width = 14 * len(w)
                line.append(
                    {
                        "text": w,
                        "box": [float(x), float(y), float(x + width), float(bottom)],
                        "b": float(bottom),
                        "confidence": rng.randint(55, 99),
                    }
                )
                x += width + 14
            par.append(line)
            y += 60
        tree.append(par)
        y += 40
    if hyphen and len(tree[0]) >= 2:
        tree[0][0][-1]["text"] += "-"
        tree[0][0][-1]["box"][2] += 14.0  # box stays one cell per character
    return tree


def _page_png(rng: random.Random, hyphen: bool = False) -> bytes:
    """A REAL page image: the word tree rasterized to genuine PNG bytes
    (glyph templates, confidence-as-ink) — the OCR branch decodes pixels,
    no metadata side channel (corpus v3; v1/v2 embedded hOCR in FAKEIMG)."""
    return raster.render_page_png(_page_tree(rng, hyphen=hyphen))


# ------------------------------------------------------------------- rows

def _payload_for(ci: int, rng: random.Random, host: str) -> tuple[bytes, str]:
    """(payload bytes, crawler text) for canonical row index ci."""
    slot = ci % 100
    if slot < 85:
        return _html_payload(rng, host)
    if slot < 91:  # single page image (real PNG)
        return _page_png(rng, hyphen=(slot == 90)), " ".join(_sentence_words(rng))
    if slot < 95:  # PDF, multi-page (incl. hyphen-across-lines page)
        n_pages = 5 if slot == 94 else rng.randint(2, 3)
        pages = [_page_png(rng, hyphen=(p == 0 and slot == 93)) for p in range(n_pages)]
        return build_fake_pdf(pages), " ".join(_sentence_words(rng))
    if slot < 96:  # ZIP with mixed-case member names (casefold sort test)
        members = [
            ("Page_B.png", _page_png(rng)),
            ("page_a.png", _page_png(rng)),
            ("PAGE_C.png", _page_png(rng)),
        ]
        return build_zip(members), " ".join(_sentence_words(rng))
    if slot < 97:  # multi-frame TIFF
        return build_fake_tiff([_page_png(rng) for _ in range(2)]), ""
    if slot < 98:  # empty body
        return b"", ""
    if slot < 99:  # garbage bytes
        return bytes(rng.getrandbits(8) for _ in range(64)), "garbage"
    # truncated fake pdf (error path: bad container)
    good = build_fake_pdf([_page_png(rng)])
    return good[: len(good) // 2], "truncated"


def canonical_index(i: int) -> int:
    """Re-crawl rule: every 20th-ish row duplicates the row 7 before it."""
    if i % 20 == 13 and i >= 7:
        return i - 7
    return i


def variant_source(ci: int) -> int | None:
    """Messy-URL rule (corpus v3): every 25th-ish row is a VARIANT CRAWL of
    the row 3 before it — same payload bytes, but the url carries crawl dirt
    (tracking params, host case, default port, fragment, trailing slash)
    that a canonicalizer must strip. Real crawls hit this on day one; these
    rows are the url_canonicalize substrate."""
    if ci % 25 == 3 and ci >= 3:
        return ci - 3
    return None


def _messy_url(host: str, src: int, ci: int) -> str:
    form = (ci // 25) % 5
    if form == 0:
        return f"https://{host}.example/p/{src}?utm_source=feed&utm_campaign=sync"
    if form == 1:
        return f"https://{host.upper()}.Example/p/{src}"
    if form == 2:
        return f"https://{host}.example/p/{src}/"
    if form == 3:
        return f"https://{host}.example/p/{src}#section-2"
    return f"https://{host}.example:443/p/{src}?ref=home"


def row_for_index(i: int, seed: int = SEED) -> dict:
    ci = canonical_index(i)
    vi = variant_source(ci)
    src = vi if vi is not None else ci
    rng = random.Random((seed << 32) ^ src)
    host = "host0" if rng.random() < 0.30 else f"host{1 + rng.randrange(49)}"
    url = _messy_url(host, src, ci) if vi is not None else f"https://{host}.example/p/{src}"
    payload, crawler_text = _payload_for(src, rng, host)
    lang = _LANG_WHEEL[rng.randrange(len(_LANG_WHEEL))]
    return {
        "url": url,
        "warc_ts": BASE_TS_US + i * 1_000_000,  # duplicates get LATER ts
        "html": payload,
        "text": crawler_text,
        "lang": lang,
    }


def rows_for_range(start: int, stop: int, seed: int = SEED) -> pa.Table:
    rows = [row_for_index(i, seed) for i in range(start, stop)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def generate_pages_parquet(
    out_dir: str, n_rows: int, seed: int = SEED, rows_per_file: int = 4096
) -> str:
    """Write the corpus as multiple parquet files (block-parallel read)."""
    os.makedirs(out_dir, exist_ok=True)
    file_no = 0
    for start in range(0, n_rows, rows_per_file):
        stop = min(start + rows_per_file, n_rows)
        table = rows_for_range(start, stop, seed)
        pq.write_table(table, os.path.join(out_dir, f"pages_{file_no:05d}.parquet"))
        file_no += 1
    return out_dir


def generate_pages_parquet_ray(
    out_dir: str, n_rows: int, seed: int = SEED, rows_per_file: int = 4096
) -> str:
    """Ray-parallel corpus generation: one task per output file. Byte-equal
    to the serial path because every row is a pure function of its index."""
    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    n_files = (n_rows + rows_per_file - 1) // rows_per_file

    def write_files(batch) -> "pa.Table":
        written = []
        for file_no in batch["file_no"].to_pylist():
            start = int(file_no) * rows_per_file
            stop = min(start + rows_per_file, n_rows)
            table = rows_for_range(start, stop, seed)
            pq.write_table(
                table, os.path.join(out_dir, f"pages_{int(file_no):05d}.parquet")
            )
            written.append({"file_no": int(file_no), "rows": stop - start})
        return pa.Table.from_pylist(written)

    (
        ray.data.range(n_files)
        .map_batches(lambda b: pa.table({"file_no": b["id"]}), batch_format="pyarrow")
        .map_batches(write_files, batch_size=1, batch_format="pyarrow")
        .materialize()
    )
    return out_dir


_CACHE_VERSION = "v4"  # v4: page images render at half resolution (the
# 300/150-DPI duality; tree coordinates unchanged — see kernels.raster
# PIXEL_SCALE). v3: real PNG page images, messy-URL variant crawls,
# intra-doc repeated paragraphs. v2: contact PII + cross-host links +
# syndicated pool.


def pages_dir_for(n_rows: int, seed: int = SEED, base: str = "/tmp/ocr_ray_pages") -> str:
    """Cached corpus directory keyed by (version, n, seed); generated once.
    Uses Ray-parallel generation when a Ray session is up and the corpus is
    large; both paths produce identical bytes."""
    out = os.path.join(base, f"{_CACHE_VERSION}_n{n_rows}_s{seed}")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        use_ray = False
        if n_rows >= 50_000:
            try:
                import ray

                use_ray = ray.is_initialized()
            except ImportError:
                pass
        if use_ray:
            generate_pages_parquet_ray(out, n_rows, SEED if seed is None else seed)
        else:
            generate_pages_parquet(out, n_rows, seed)
        with open(marker, "w") as f:
            f.write("ok")
    return out
