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


def cluster_points(points, eps: float = 0.025, min_cluster_size: int = 5,
                   min_samples: int | None = None) -> list[list[int]]:
    """HDBSCAN-lite density clustering of a normalized 2-D point cloud — the
    algorithmic core of the reference's CV layout segmentation
    (/root/reference/server/src/utils/image.py:140-227: corners → normalized
    cloud → HDBSCAN(min_cluster_size=5, cluster_selection_epsilon=0.025) →
    cluster bboxes). No hdbscan/cv2 in this container, so the backbone is
    implemented directly (pure numpy, deterministic; Campello et al. 2013 /
    McInnes & Healy 2017, both public):

    - core distance  = distance to the ``min_samples``-th nearest neighbour
      (hdbscan's default ``min_samples = min_cluster_size``);
    - mutual reachability  d_mr(a,b) = max(core_a, core_b, d(a,b));
    - single linkage over d_mr, cut at ``eps`` — with a large
      ``cluster_selection_epsilon`` hdbscan merges every leaf below eps,
      i.e. DBSCAN* at that threshold, which is exactly this cut;
    - components with ≥ ``min_cluster_size`` points survive, the rest is
      noise.

    Unlike the round-1 plain eps-linkage stand-in, sparse bridge points
    (core distance > eps) can no longer chain two dense blocks into one
    cluster — the behaviour that makes hdbscan robust on density-varying
    pages. Returns clusters as lists of point indices (ascending; clusters
    ordered by smallest member index)."""
    import numpy as np

    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return []
    if min_samples is None:
        min_samples = min_cluster_size
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2))
    # hdbscan's core distance counts the point itself as neighbour 0
    # (tree.query(X, k=min_samples)[..., -1]): index min_samples-1 of the
    # self-inclusive sorted row
    k = min(min_samples - 1, n - 1)
    core = np.partition(d, k, axis=1)[:, k] if n > 1 else np.zeros(1)
    mr = np.maximum(d, np.maximum(core[:, None], core[None, :]))
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ii, jj = np.nonzero(mr <= eps)
    for a, b in zip(ii, jj):
        if a < b:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra
    clusters: dict[int, list[int]] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)
    out = [sorted(members) for members in clusters.values()
           if len(members) >= min_cluster_size]
    out.sort(key=lambda c: c[0])
    return out


def _cluster_corner_boxes(points, page_w: float, page_h: float,
                          pad: float) -> list[list[float]]:
    """Normalized (x, y) corner cloud → clustered layout boxes ±pad
    (image.py:195-227: normalize → HDBSCAN → merged cluster bbox)."""
    boxes = []
    for cluster in cluster_points(points):
        xs = [points[i][0] for i in cluster]
        ys = [points[i][1] for i in cluster]
        boxes.append(
            [max(0.0, min(xs) * page_w - pad), max(0.0, min(ys) * page_h - pad),
             min(page_w, max(xs) * page_w + pad), min(page_h, max(ys) * page_h + pad)]
        )
    return boxes


def cv_layout_boxes(word_boxes, page_w: float, page_h: float,
                    pad: float = 5.0) -> list[list[float]]:
    """CV layout segmentation over a word-box corner cloud: the corner
    detector is approximated as the corners of already-recognized word
    boxes, then the REAL pipeline runs: normalize → cluster → merged
    cluster bbox ±pad (image.py:195-227). Kept for markup-only inputs;
    the pixel-native front end is :func:`cv_layout_boxes_pixels`."""
    points = []
    for left, top, right, bottom in word_boxes:
        for x, y in ((left, top), (right, top), (left, bottom), (right, bottom)):
            points.append((x / page_w, y / page_h))
    return _cluster_corner_boxes(points, page_w, page_h, pad)


def cv_layout_boxes_pixels(img, page_w: float, page_h: float,
                           pad: float = 5.0) -> list[list[float]]:
    """PIXEL-NATIVE L2 front end: corner points computed from ink
    transitions over the decoded page array (kernels.raster.corner_points —
    threshold → morphological closing → quad-count corners), exactly the
    reference's FAST/contour chain shape (image.py:140-227), then the same
    normalize → cluster → bbox back end. Corner coordinates are converted
    from pixels back to tree units (×PIXEL_SCALE) so downstream geometry
    matches the word-box path's coordinate system."""
    from .raster import PIXEL_SCALE, corner_points

    pts = corner_points(img)
    points = [
        (x * PIXEL_SCALE / page_w, y * PIXEL_SCALE / page_h)
        for x, y in pts.tolist()
    ]
    return _cluster_corner_boxes(points, page_w, page_h, pad)


def group_bounds(group: dict) -> list[float]:
    """Bounding box [l, t, r, b] covering all squares of a group."""
    squares = group["squares"]
    return [
        min(s["left"] for s in squares),
        min(s["top"] for s in squares),
        max(s["right"] for s in squares),
        max(s["bottom"] for s in squares),
    ]
