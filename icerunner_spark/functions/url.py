"""URL canonicalization for web-corpus deduplication.

Web-scale training corpora (Common-Crawl-derived pipelines) dedupe first
on the *canonical* URL — the cheapest dedup signal there is — before any
content hashing: the same page is typically fetched under dozens of URL
spellings (case differences in scheme/host, default ports, tracking
parameters, parameter order, trailing slashes, fragments). The reference
has no URL tooling (icerunner.py delegates everything to DuckDB);
SURVEY.md §2.C's dedup family is where this slots in.

Every rule is a Catalyst expression (regexp / split / higher-order array
functions) — whole-stage-codegen'd, zero Python, zero shuffle: at 100 TB
this runs at scan speed as a narrow projection. The rules are plain
regex + list operations on purpose, so any engine (the DuckDB oracle
replays them with ``regexp_extract``/``list_filter``/``list_sort``) gets
the byte-identical canonical form.

Canonicalization rules (applied in order):
1. drop the fragment (``#...``),
2. lowercase the scheme and host,
3. strip a leading ``www.`` host label,
4. strip the default port (``:80`` for http, ``:443`` for https),
5. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``),
6. sort the surviving query parameters bytewise,
7. strip one trailing slash from a non-root path; empty path becomes
   ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page identity
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules — a single
    codegen-friendly expression tree, null-safe (null in, null out).
    URLs without a ``scheme://`` prefix pass through lowercased-host
    rules only where they can be identified; in practice feed this
    absolute URLs."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # everything after the authority: path + query
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")  # 3. www label
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), host, port_part, path, query_part
    )
