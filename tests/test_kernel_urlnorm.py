"""URL canonicalizer: kernel behavior + engine/oracle parity on edge urls
the synthetic corpus never produces (round-3 ADVICE: an all-slash path
diverged between Python's rstrip-and-restore and the SQL regexp_replace)."""

import duckdb
import pytest

from ocr_ray.kernels.urlnorm import canonical_url
from ocr_ray.ops.oracles import url_canonicalize_sql

EDGE_URLS = [
    "https://h.example//",                       # all-slash path → '/'
    "https://h.example///",
    "https://h.example",                         # no path → '/'
    "https://h.example/",
    "https://h.example/a/b///",                  # trailing slash run strips
    "https://H.Example:443/a?utm_source=x&k=1",  # port + tracking param
    "http://h.example:80/a#frag",
    "https://h.example/a?ref=home&utm_campaign=z",  # query empties out
    "https://h.example/p/7?keep=1&utm_medium=m&other=2",
    "not-a-url",                                 # untouched passthrough
]


@pytest.mark.parametrize(
    ("url", "expect"),
    [
        ("https://h.example//", "https://h.example/"),
        ("https://h.example///", "https://h.example/"),
        ("https://h.example", "https://h.example/"),
        ("https://h.example/a/b///", "https://h.example/a/b"),
    ],
)
def test_canonical_url_slash_paths(url, expect):
    assert canonical_url(url) == expect


def test_canonical_url_matches_oracle_sql_on_edges():
    """Run the EXACT oracle algebra over literal edge urls and compare it
    with the Python kernel row by row."""
    values = ", ".join(f"('{u}')" for u in EDGE_URLS if u != "not-a-url")
    sql = url_canonicalize_sql(f"(VALUES {values}) AS t(url)")
    got = {u: c for u, c, _ in duckdb.sql(sql).fetchall()}
    for url in EDGE_URLS:
        if url == "not-a-url":
            assert canonical_url(url) == url  # SQL side never sees non-urls
            continue
        assert got[url] == canonical_url(url), url
