"""Single-process oracle: the golden-output generator for regression tests.

Runs the exact extraction core sequentially over an Arrow pages table —
no Ray — and produces the EXTRACT_SCHEMA output with latest-wins url dedup
and deterministic ordering. Pipeline tests assert the distributed result is
byte-identical to this (SURVEY.md §5.2: "the kernel is the oracle").
"""

from __future__ import annotations

import pyarrow as pa

from .config import OcrConfig, resolve_config
from .engines import get_engine_cls
from .extract_core import DEFAULT_NUM_PARTS, extract_document, url_part
from .schemas import EXTRACT_SCHEMA


def extract_table(
    pages: pa.Table,
    config: OcrConfig | None = None,
    num_parts: int = DEFAULT_NUM_PARTS,
    dedup: bool = True,
) -> pa.Table:
    """pages table → extraction output table, sorted by (part, url)."""
    config = config or resolve_config()
    engine = get_engine_cls(config.engine)(config)
    rows = pages.to_pylist()
    out = []
    for row in rows:
        rec = extract_document(row["html"], engine)
        rec.update(
            url=row["url"],
            warc_ts=row["warc_ts"],
            lang=row["lang"],
            part=url_part(row["url"], num_parts),
        )
        out.append(rec)
    if dedup:
        # latest-wins with the sink's exact tiebreak: max (warc_ts, text)
        latest: dict[str, dict] = {}
        for rec in out:
            prev = latest.get(rec["url"])
            if prev is None or (rec["warc_ts"], rec["text"]) > (prev["warc_ts"], prev["text"]):
                latest[rec["url"]] = rec
        out = list(latest.values())
    out.sort(key=lambda r: (r["part"], r["url"]))
    return pa.Table.from_pylist(out, schema=EXTRACT_SCHEMA)
