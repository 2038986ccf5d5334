"""URL canonicalization — the day-one normalizer of every crawl pipeline.

Rules (each step mirrored 1:1 by the DuckDB oracle SQL, so both engines run
the SAME algorithm rather than two approximations):

1. drop the fragment (``#...``);
2. lowercase the scheme and the authority (host[:port]);
3. strip the scheme's default port (``:443`` for https, ``:80`` for http);
4. drop tracking query parameters (``utm_*`` and ``ref``); drop the ``?``
   if nothing remains;
5. strip trailing slashes from a non-root path.

Plain regex string surgery on purpose — no urllib: the oracle replays the
identical regexes, and RE2 (DuckDB) and Python `re` agree on this subset
(no backreferences/lookaround).
"""

from __future__ import annotations

import re

SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")
AUTHORITY_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)")
PATH_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)")
QUERY_RE = re.compile(r"\?([^#]*)")
TRACKING_PARAM_RE = re.compile(r"^(utm_[^=]*|ref)(=|$)")

_DEFAULT_PORTS = {"https": ":443", "http": ":80"}


def canonical_url(url: str) -> str:
    m = SCHEME_RE.match(url)
    if not m:
        return url  # not an absolute http(s)-style url: leave untouched
    scheme = m.group(1).lower()
    am = AUTHORITY_RE.match(url)
    authority = am.group(1).lower() if am else ""
    default_port = _DEFAULT_PORTS.get(scheme)
    if default_port and authority.endswith(default_port):
        authority = authority[: -len(default_port)]
    pm = PATH_RE.match(url)
    path = pm.group(1) if pm else ""
    if path and path != "/":
        path = path.rstrip("/")
    if not path:
        path = "/"
    qm = QUERY_RE.search(url.split("#", 1)[0])
    query = ""
    if qm:
        kept = [p for p in qm.group(1).split("&")
                if p and not TRACKING_PARAM_RE.match(p)]
        query = "&".join(kept)
    out = f"{scheme}://{authority}{path}"
    if query:
        out += f"?{query}"
    return out
