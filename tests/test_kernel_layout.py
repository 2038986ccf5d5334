"""Reading-order sort + renumber (parity: celery_app.py:156-168)."""

from ocr_ray.kernels.layout import group_bounds, make_box_group, reading_order, split_by_kind


def test_reading_order_sort_and_renumber():
    groups = [
        make_box_group(50, 100, 200, 150),   # lower
        make_box_group(300, 10, 400, 50),    # top right
        make_box_group(10, 10, 200, 50),     # top left
    ]
    ordered = reading_order(groups, page_no=2)
    tops = [(g["squares"][0]["top"], g["squares"][0]["left"]) for g in ordered]
    assert tops == [(10, 10), (10, 300), (100, 50)]
    assert [g["groupId"] for g in ordered] == ["2.1", "2.2", "2.3"]
    assert ordered[0]["squares"][0]["id"] == "2.1"


def test_deterministic_uniq_id():
    a = make_box_group(1, 2, 3, 4, seed="s")
    b = make_box_group(1, 2, 3, 4, seed="s")
    assert a["_uniq_id"] == b["_uniq_id"]
    assert len(a["_uniq_id"]) == 16


def test_split_by_kind_and_bounds():
    groups = [
        make_box_group(0, 0, 10, 10, kind="text"),
        make_box_group(0, 0, 10, 10, kind="image"),
        make_box_group(0, 0, 10, 10, kind="remove"),
    ]
    text, image, remove = split_by_kind(groups)
    assert len(text) == len(image) == len(remove) == 1
    g = make_box_group(5, 6, 20, 30)
    g["squares"].append({"id": "x", "top": 2, "left": 1, "bottom": 40, "right": 8})
    assert group_bounds(g) == [1, 2, 20, 40]
