"""End-to-end pipeline tests: distributed result must be byte-identical to
the single-process oracle (SURVEY.md §5.2)."""

import os
import shutil

import pyarrow as pa
import pytest

from ocr_ray.oracle import extract_table
from ocr_ray.synth import pages_dir_for, rows_for_range

N_ROWS = 300


@pytest.fixture(scope="module")
def corpus_dir():
    return pages_dir_for(N_ROWS)


@pytest.fixture(scope="module")
def golden():
    return extract_table(rows_for_range(0, N_ROWS))


def _sorted(table: pa.Table) -> pa.Table:
    return table.sort_by([("part", "ascending"), ("url", "ascending")])


def _assert_tables_equal(got: pa.Table, want: pa.Table):
    assert got.num_rows == want.num_rows
    for name in want.column_names:
        g = got.column(name).to_pylist()
        w = want.column(name).to_pylist()
        assert g == w, f"column {name} differs"


def test_flagship_matches_oracle(ray_session, corpus_dir, golden):
    import ray.data

    from ocr_ray.pipelines.extract import extract_dataset, finalize

    ds = ray.data.read_parquet(corpus_dir)
    out = finalize(extract_dataset(ds)).take_all()
    got = _sorted(pa.Table.from_pylist(out, schema=golden.schema))
    _assert_tables_equal(got, golden)


def test_exploded_variant_matches_oracle(ray_session, corpus_dir, golden):
    import ray.data

    from ocr_ray.pipelines.explode_variant import extract_dataset_exploded
    from ocr_ray.pipelines.extract import finalize

    ds = ray.data.read_parquet(corpus_dir)
    out = finalize(extract_dataset_exploded(ds)).take_all()
    got = _sorted(pa.Table.from_pylist(out, schema=golden.schema))
    _assert_tables_equal(got, golden)


def test_sink_write_and_resume(ray_session, corpus_dir, golden, tmp_path_factory):
    from ocr_ray.pipelines.extract import run_extract
    from ocr_ray.sinks.parquet_sink import (
        MANIFEST_NAME,
        committed_parts,
        partition_dir,
        read_output,
    )

    out_dir = str(tmp_path_factory.mktemp("extract_out"))
    manifests, _ = run_extract(corpus_dir, out_dir)
    parts = committed_parts(out_dir)
    assert len(parts) == manifests.count()

    got = _sorted(read_output(out_dir))
    _assert_tables_equal(got, golden)

    # simulate a crash that lost one partition: drop its manifest
    victim = sorted(parts)[0]
    os.remove(os.path.join(partition_dir(out_dir, victim), MANIFEST_NAME))
    survivor = sorted(parts)[1]
    survivor_manifest = os.path.join(partition_dir(out_dir, survivor), MANIFEST_NAME)
    mtime_before = os.path.getmtime(survivor_manifest)

    manifests2, _ = run_extract(corpus_dir, out_dir)
    # only the victim partition was recomputed
    assert manifests2.count() == 1
    assert manifests2.take_all()[0]["part"] == victim
    assert os.path.getmtime(survivor_manifest) == mtime_before
    assert committed_parts(out_dir) == parts

    got = _sorted(read_output(out_dir))
    _assert_tables_equal(got, golden)


def test_manifest_lineage(ray_session, corpus_dir, tmp_path_factory):
    import json

    from ocr_ray.pipelines.extract import run_extract
    from ocr_ray.sinks.parquet_sink import MANIFEST_NAME, committed_parts, partition_dir

    out_dir = str(tmp_path_factory.mktemp("lineage_out"))
    run_extract(corpus_dir, out_dir)
    part = sorted(committed_parts(out_dir))[0]
    with open(os.path.join(partition_dir(out_dir, part), MANIFEST_NAME)) as f:
        manifest = json.load(f)
    assert manifest["part"] == part
    assert manifest["input"] == corpus_dir
    assert manifest["n_rows"] > 0
    assert len(manifest["text_sha256"]) == 64


def test_cached_extraction_output_matches_streamed(ray_session):
    """ops.extraction_queries.extraction_output (resume-cache path) must be
    row-identical to the direct streamed pipeline."""
    import pandas as pd

    from ocr_ray.ops.extraction_queries import (
        extraction_output,
        extraction_output_streamed,
    )

    sf = "/root/testdata/sf0.001"
    cached = pd.DataFrame(extraction_output(sf).take_all())
    streamed = pd.DataFrame(extraction_output_streamed(sf).take_all())
    cached = cached.sort_values(["part", "url"]).reset_index(drop=True)
    streamed = streamed.sort_values(["part", "url"]).reset_index(drop=True)
    assert list(cached.columns) == list(streamed.columns)
    for col in ("url", "text", "n_pages", "n_words", "error", "branch"):
        assert cached[col].tolist() == streamed[col].tolist(), col
    assert [len(s) for s in cached["spans"]] == [len(s) for s in streamed["spans"]]


def test_choose_num_parts_scales_with_input(tmp_path):
    from ocr_ray.pipelines.extract import (
        DEFAULT_NUM_PARTS, MAX_NUM_PARTS, choose_num_parts,
    )

    # small / missing inputs keep the historical default layout
    assert choose_num_parts(str(tmp_path)) == DEFAULT_NUM_PARTS
    assert choose_num_parts("/nonexistent/path") == DEFAULT_NUM_PARTS
    small = tmp_path / "a.parquet"
    small.write_bytes(b"x" * 1024)
    assert choose_num_parts(str(small)) == DEFAULT_NUM_PARTS
    # large inputs grow ~1 part per 32 MB, capped
    big = tmp_path / "big.parquet"
    big.write_bytes(b"")
    import os

    os.truncate(big, 10 << 30)  # sparse 10 GB
    assert choose_num_parts(str(big)) == (10 << 30) // (32 << 20)
    os.truncate(big, 1 << 40)  # sparse 1 TB: still below the cap
    assert choose_num_parts(str(big)) == (1 << 40) // (32 << 20)
    os.truncate(big, 9 << 40)  # sparse 9 TB: cap binds (8 TB = cap x 32 MB)
    assert choose_num_parts(str(big)) == MAX_NUM_PARTS


def test_sink_reachability_guard(ray_session, monkeypatch):
    from ocr_ray.pipelines import extract as ex

    # single node: always fine
    ex.check_sink_reachability("/tmp/whatever")
    # fake a 4-node cluster: must demand the shared-fs acknowledgement
    import ray as _ray

    monkeypatch.setattr(_ray, "nodes", lambda: [{"Alive": True}] * 4)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="shared"):
        ex.check_sink_reachability("/tmp/whatever")
    monkeypatch.setenv("OCR_RAY_SHARED_FS", "1")
    ex.check_sink_reachability("/tmp/whatever")


def test_sink_ipc_tmp_format(ray_session, corpus_dir, golden, tmp_path_factory, monkeypatch):
    """OCR_RAY_TMP_FORMAT=ipc routes the transient storage-shuffle shards
    through Arrow IPC + lz4; committed output must be identical."""
    import ray

    from ocr_ray.pipelines.extract import run_extract
    from ocr_ray.sinks.parquet_sink import read_output

    monkeypatch.setenv("OCR_RAY_TMP_FORMAT", "ipc")
    out_dir = str(tmp_path_factory.mktemp("extract_out_ipc"))
    run_extract(corpus_dir, out_dir)
    got = _sorted(read_output(out_dir))
    _assert_tables_equal(got, golden)
