"""ES bulk sink (W8): deterministic ids, NDJSON shape, file chunking."""

import json

from ocr_ray.sinks import es_bulk


def test_deterministic_page_id_parity():
    # pinned value of the reference's seeded-UUID4 derivation
    # (file.py:233-237): random.seed(path) -> 16 getrandbits(8) bytes
    assert es_bulk.deterministic_page_id(
        "files/doc1/_ocr_results/page_0.json"
    ) == "d92651c1-d8af-460e-ae85-18bbe26657dd"
    # idempotent + collision-free across paths
    a = es_bulk.deterministic_page_id("p1")
    assert a == es_bulk.deterministic_page_id("p1")
    assert a != es_bulk.deterministic_page_id("p2")
    # UUID4-shaped (version nibble)
    assert a[14] == "4"


def test_bulk_pair_bytes():
    es_id, bulk = es_bulk.page_bulk_record(
        "doc1", "u#page=0", 0, "Olá texto", "stub", "lang=por"
    )
    assert bulk == (
        '{"index":{"_index":"documents","_id":"7c1d5252-9b21-4b98-aed4-7c284fcb47e6"}}\n'
        '{"Document":"doc1","Path":"u#page=0","Page":0,"Text":"Olá texto",'
        '"Engine":"stub","Config":"lang=por"}\n'
    )
    action, doc = bulk.strip().split("\n")
    assert json.loads(action)["index"]["_id"] == es_id
    assert json.loads(doc)["Text"] == "Olá texto"


def test_mapping_and_settings_shape():
    s, m = es_bulk.INDEX_SETTINGS, es_bulk.INDEX_MAPPING
    assert s["analysis"]["filter"]["stop_eng_pt"]["stopwords"] == [
        "_english_", "_portuguese_"
    ]
    assert m["properties"]["Text"]["analyzer"] == "text_analyzer"
    assert m["properties"]["Document"]["fields"]["keyword"]["type"] == "keyword"


def test_write_bulk_files_chunks(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    rows = [{"bulk": f'{{"index":{{"_id":"{i}"}}}}\n{{"Text":"t{i}"}}\n'}
            for i in range(11)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    paths = es_bulk.write_bulk_files(ds, str(tmp_path / "bulk"), lines_per_file=4)
    assert len(paths) == 3
    total = "".join(open(p, encoding="utf-8").read() for p in paths)
    assert total.count('{"index"') == 11
