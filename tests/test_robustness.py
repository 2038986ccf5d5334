"""Edge-input robustness: the pipeline must degrade gracefully, never
poison a partition (SURVEY.md §4.1 retries row — a deliberate upgrade over
the reference's abort-probe)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.schemas import PAGES_SCHEMA


def _write(tmp_path, rows, name="pages.parquet"):
    table = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    path = str(tmp_path / name)
    pq.write_table(table, path)
    return path


def test_single_row_pipeline(ray_session, tmp_path):
    from ocr_ray.pipelines.extract import run_extract
    from ocr_ray.sinks.parquet_sink import read_output

    path = _write(tmp_path, [{
        "url": "https://x.example/1", "warc_ts": 1_700_000_000_000_000,
        "html": b"<html><body><p>one single page with enough words to keep here</p></body></html>",
        "text": "", "lang": "eng",
    }])
    out = str(tmp_path / "out")
    manifests, _ = run_extract(path, out, num_parts=4)
    t = read_output(out)
    assert t.num_rows == 1
    row = t.to_pylist()[0]
    assert row["branch"] == "html" and "single page" in row["text"]


def test_all_error_rows(ray_session, tmp_path):
    from ocr_ray.pipelines.extract import run_extract
    from ocr_ray.sinks.parquet_sink import read_output

    rows = [
        {"url": f"https://x.example/{i}", "warc_ts": 1_700_000_000_000_000 + i,
         "html": bytes([i % 7] * 10), "text": "", "lang": "por"}
        for i in range(20)
    ]
    path = _write(tmp_path, rows)
    out = str(tmp_path / "out_err")
    manifests, _ = run_extract(path, out, num_parts=4)
    t = read_output(out)
    assert t.num_rows == 20
    assert all(r["error"] is not None for r in t.to_pylist())
    assert all(r["text"] == "" for r in t.to_pylist())


def test_num_parts_one(ray_session, tmp_path):
    from ocr_ray.pipelines.extract import run_extract
    from ocr_ray.sinks.parquet_sink import committed_parts, read_output

    rows = [
        {"url": f"https://h{i}.example/{i}", "warc_ts": 1_700_000_000_000_000 + i,
         "html": b"<p>body paragraph with plenty of content words to pass scoring</p>",
         "text": "", "lang": "eng"}
        for i in range(10)
    ]
    path = _write(tmp_path, rows)
    out = str(tmp_path / "out_p1")
    run_extract(path, out, num_parts=1)
    assert committed_parts(out) == frozenset({0})
    assert read_output(out).num_rows == 10


def test_tie_on_warc_ts_is_deterministic(ray_session, tmp_path):
    """Two rows, same url, same warc_ts, different payload: dedup must pick
    deterministically (the sort tiebreak), identically on every run."""
    from ocr_ray.pipelines.extract import run_extract
    from ocr_ray.sinks.parquet_sink import read_output

    rows = [
        {"url": "https://t.example/1", "warc_ts": 1_700_000_000_000_000,
         "html": b"<p>version alpha of the page with enough words to be kept</p>",
         "text": "", "lang": "eng"},
        {"url": "https://t.example/1", "warc_ts": 1_700_000_000_000_000,
         "html": b"<p>version beta of the page with enough words to be kept</p>",
         "text": "", "lang": "eng"},
    ]
    path = _write(tmp_path, rows)
    texts = set()
    for run in range(2):
        out = str(tmp_path / f"out_tie_{run}")
        run_extract(path, out, num_parts=2)
        t = read_output(out)
        assert t.num_rows == 1
        texts.add(t.to_pylist()[0]["text"])
    assert len(texts) == 1  # same winner every time


def test_oracle_rejects_unknown_engine():
    from ocr_ray.engines import get_engine_cls

    with pytest.raises(ValueError, match="unknown OCR engine"):
        get_engine_cls("nope")
