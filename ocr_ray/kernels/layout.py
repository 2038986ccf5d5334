"""Layout records + reading-order sort.

Layout box-group record shape (parity:
/root/reference/server/celery_app.py:128-147):
``{"_uniq_id", "groupId", "checked", "type": "text"|"image"|"remove",
"squares": [{"id","top","left","bottom","right"}], "copyId"}``.

``reading_order`` reproduces the reference's top-left→bottom-right sort and
group renumbering (celery_app.py:156-168): sort by ``(top, left)`` of the
first square, then assign ``groupId``/square ``id`` = ``"{page}.{idx}"``
(both 1-based). Each page sorts independently — this is always an in-UDF
sort, never a distributed one.
"""

from __future__ import annotations

import hashlib


def make_box_group(left: float, top: float, right: float, bottom: float,
                   kind: str = "text", seed: str = "") -> dict:
    """Build one layout box group. ``_uniq_id`` is a deterministic 16-hex id
    (the reference uses uuid4; we derive it from the geometry + seed so
    fixtures are reproducible)."""
    uniq = hashlib.sha256(
        f"{seed}|{left},{top},{right},{bottom},{kind}".encode()
    ).hexdigest()[:16]
    return {
        "_uniq_id": uniq,
        "groupId": "temp",
        "checked": False,
        "type": kind,
        "squares": [
            {"id": "temp", "top": top, "left": left, "bottom": bottom, "right": right}
        ],
        "copyId": None,
    }


def reading_order(box_groups: list[dict], page_no: int) -> list[dict]:
    """Sort one page's box groups into reading order and renumber them.

    ``page_no`` is 1-based in the emitted group ids (parity:
    celery_app.py:160-166 uses ``page + 1``).
    """
    ordered = sorted(
        box_groups,
        key=lambda g: (g["squares"][0]["top"], g["squares"][0]["left"]),
    )
    for idx, group in enumerate(ordered):
        gid = f"{page_no}.{idx + 1}"
        group["groupId"] = gid
        for square in group["squares"]:
            square["id"] = gid
    return ordered


def split_by_kind(box_groups: list[dict]) -> tuple[list, list, list]:
    """Partition groups into (text, image, remove) — the three routing
    classes consumed by the page-OCR operator
    (parity: /root/reference/server/celery_app.py:1044-1060)."""
    text, image, remove = [], [], []
    for group in box_groups:
        {"text": text, "image": image, "remove": remove}.get(
            group.get("type", "text"), text
        ).append(group)
    return text, image, remove


def group_bounds(group: dict) -> list[float]:
    """Bounding box [l, t, r, b] covering all squares of a group."""
    squares = group["squares"]
    return [
        min(s["left"] for s in squares),
        min(s["top"] for s in squares),
        max(s["right"] for s in squares),
        max(s["bottom"] for s in squares),
    ]
