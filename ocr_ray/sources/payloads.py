"""Payload container formats, content sniffing and page explode (S1-S5).

The reference routes documents by file extension
(/root/reference/server/celery_app.py:429-505 with the allowed-extension list
at server/src/utils/file.py:21-37); a Parquet page table has no filenames, so
the router sniffs magic bytes instead.

Real raster/PDF decoding libraries (pypdfium2, PIL) are not available in this
container, so each real format has a clearly-marked deterministic FAKE twin
the synthetic corpus uses; the explode logic, ordering semantics, page
numbering and error paths are real and fully exercised:

- ``FAKEIMG``: ``b"FAKEIMG\\n" + hOCR bytes`` — a "page image" whose pixels
  are replaced by the hOCR a perfect OCR engine would produce for it.
- fake PDF: ``b"%PDF-FAKE\\n"`` + u32 page count + length-prefixed FAKEIMG
  blobs (one per page). Mirrors S1 (per-page render,
  celery_app.py:887-942).
- ZIP: a *real* zip archive (stdlib) of FAKEIMG members; member ordering is
  the reference's casefold-with-raw-tiebreak sort (celery_app.py:456). S2.
- fake TIFF: ``b"FAKETIFF"`` + frame blobs, mirroring the frame loop of S3
  (celery_app.py:470-492).
- single image: a bare FAKEIMG payload passes through as page 0 (S4,
  celery_app.py:494-502).
"""

from __future__ import annotations

import io
import struct
import zipfile

from ..kernels.textfn import zip_member_key

FAKEIMG_MAGIC = b"FAKEIMG\n"
FAKEPDF_MAGIC = b"%PDF-FAKE\n"
FAKETIFF_MAGIC = b"FAKETIFF"

# Real-world magics recognized so genuine payloads route correctly when the
# decode libraries exist (tesseract branch) or fail loudly when they don't.
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"
_TIFF_MAGICS = (b"II*\x00", b"MM\x00*")
_ZIP_MAGIC = b"PK\x03\x04"
_PDF_MAGIC = b"%PDF"


class UnsupportedPayloadError(ValueError):
    """Payload bytes that no branch can decode (router dead end — the
    reference rejects by extension at celery_app.py:429-433)."""


def sniff_format(data: bytes) -> str:
    """Classify payload bytes: html | pdf | zip | tiff | image | unknown."""
    if not data:
        return "unknown"
    head = data[:512]
    if head.startswith(FAKEIMG_MAGIC) or head.startswith(_PNG_MAGIC) or head.startswith(_JPEG_MAGIC):
        return "image"
    if head.startswith(FAKETIFF_MAGIC) or head.startswith(_TIFF_MAGICS):
        return "tiff"
    if head.startswith(_ZIP_MAGIC):
        return "zip"
    if head.startswith(_PDF_MAGIC):  # covers %PDF-FAKE too
        return "pdf"
    stripped = head.lstrip()
    low = stripped[:256].lower()
    if low.startswith(b"<!doctype") or low.startswith(b"<html") or b"<html" in low or b"<body" in low or low.startswith(b"<"):
        return "html"
    return "unknown"


# ------------------------------------------------------------- fake builders

def build_fake_image(hocr: str) -> bytes:
    return FAKEIMG_MAGIC + hocr.encode("utf-8")


def _pack_blobs(magic: bytes, blobs: list[bytes]) -> bytes:
    out = [magic, struct.pack(">I", len(blobs))]
    for blob in blobs:
        out.append(struct.pack(">I", len(blob)))
        out.append(blob)
    return b"".join(out)


def _unpack_blobs(data: bytes, magic: bytes) -> list[bytes]:
    if not data.startswith(magic):
        raise UnsupportedPayloadError(f"bad magic for {magic!r}")
    off = len(magic)
    (count,) = struct.unpack_from(">I", data, off)
    off += 4
    blobs = []
    for _ in range(count):
        if off + 4 > len(data):
            raise UnsupportedPayloadError("truncated multi-page payload")
        (n,) = struct.unpack_from(">I", data, off)
        off += 4
        if off + n > len(data):
            raise UnsupportedPayloadError("truncated page blob")
        blobs.append(data[off : off + n])
        off += n
    return blobs


def build_fake_pdf(page_images: list[bytes]) -> bytes:
    """Multi-page container of page-image blobs (corpus v3: real PNGs)."""
    return _pack_blobs(FAKEPDF_MAGIC, list(page_images))


def build_fake_tiff(frame_images: list[bytes]) -> bytes:
    return _pack_blobs(FAKETIFF_MAGIC, list(frame_images))


def build_zip(members: list[tuple[str, bytes]]) -> bytes:
    """Real zip of (member_name, image bytes) pairs — stored, deterministic."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, blob in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, blob)
    return buf.getvalue()


# ------------------------------------------------------------------ explode

def explode_pdf(data: bytes) -> list[bytes]:
    """PDF → per-page image bytes (S1). Fake PDFs decode natively; real PDFs
    need pypdfium2 (absent here — import-gated)."""
    if data.startswith(FAKEPDF_MAGIC):
        return _unpack_blobs(data, FAKEPDF_MAGIC)
    try:
        import pypdfium2 as pdfium  # noqa: F401
    except ImportError as exc:
        raise UnsupportedPayloadError(
            "real PDF payload but pypdfium2 is not installed"
        ) from exc
    # Real path (untested in this container): render at 300 DPI like the
    # reference (celery_app.py:896-898, scale 300/72).
    pdf = pdfium.PdfDocument(io.BytesIO(data))
    pages = []
    for page in pdf:
        bitmap = page.render(scale=300 / 72)
        pages.append(bitmap.to_pil().tobytes())
    return pages


def explode_zip(data: bytes) -> list[bytes]:
    """ZIP → member images sorted by (casefold, raw) name (S2;
    parity: celery_app.py:441-468)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
        names.sort(key=zip_member_key)
        return [zf.read(n) for n in names]


def explode_tiff(data: bytes) -> list[bytes]:
    """TIFF → per-frame images (S3). Fake TIFFs decode natively; real
    multi-frame TIFF needs PIL (absent here — import-gated)."""
    if data.startswith(FAKETIFF_MAGIC):
        return _unpack_blobs(data, FAKETIFF_MAGIC)
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise UnsupportedPayloadError(
            "real TIFF payload but PIL is not installed"
        ) from exc
    img = Image.open(io.BytesIO(data))
    frames = []
    for i in range(getattr(img, "n_frames", 1)):
        img.seek(i)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        frames.append(buf.getvalue())
    return frames


def explode_pages(data: bytes) -> list[bytes]:
    """Extension router (S5): payload bytes → ordered page-image list."""
    fmt = sniff_format(data)
    if fmt == "pdf":
        return explode_pdf(data)
    if fmt == "zip":
        return explode_zip(data)
    if fmt == "tiff":
        return explode_tiff(data)
    if fmt == "image":
        return [data]
    raise UnsupportedPayloadError(f"cannot explode payload of format {fmt!r}")
