"""Frozen golden regression (north_rule: byte-identical extracted text per
url vs committed fixtures — strictly stronger than the reference's
SequenceMatcher ratio check, SURVEY.md §5).

tests/golden/golden_200.parquet was produced ONCE by the pure-kernel oracle
over the first 200 synthetic corpus rows and committed. Any change to any
kernel, engine, payload format or assembly rule that alters a single output
byte fails here."""

import os

import pyarrow.parquet as pq

from ocr_ray.oracle import extract_table
from ocr_ray.synth import rows_for_range

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_200.parquet")


def test_oracle_matches_frozen_golden():
    golden = pq.read_table(GOLDEN)
    got = extract_table(rows_for_range(0, 200))
    assert got.num_rows == golden.num_rows
    for name in golden.column_names:
        assert got.column(name).to_pylist() == golden.column(name).to_pylist(), (
            f"kernel output drifted from frozen golden in column {name}"
        )


def test_golden_covers_both_branches_and_errors():
    golden = pq.read_table(GOLDEN).to_pylist()
    branches = {r["branch"] for r in golden}
    assert branches == {"html", "ocr", "error"}
    multi = [r for r in golden if r["n_pages"] > 1]
    assert multi, "golden must include multi-page documents"
    assert any(r["error"] for r in golden)
