"""ads.txt / app-ads.txt parsing (IAB Tech Lab spec) — pure Python,
stdlib only.

``/ads.txt`` is a well-known file declaring which ad systems may
sell a domain's inventory. For a web-corpus pipeline it is a cheap
host-reputation and commercial-affiliation signal (a host whose
ads.txt lists hundreds of RESELLER rows is a very different animal
from one with two DIRECT rows), and it joins the robots.txt /
security well-known family the crawl side already fetches.

Grammar subset (deterministic, shared by all three engines):
- lines split on ``\\n`` (a ``\\r`` immediately before is stripped
  with surrounding blanks); ``#`` starts a comment to end of line;
- whitespace = ASCII space/tab only, trimmed per field (the RE2/Java
  common-subset rule: never ``\\s``);
- a non-empty line WITHOUT a comma that contains ``=`` is a
  variable record: name (uppercased) = value, both trimmed;
- any other non-empty line is a data record: comma-separated
  fields — ``ad_domain, publisher_id, relationship[, cert_id]``.
  Rows with fewer than 3 non-empty-domain fields are dropped;
  ``ad_domain`` lowercases; ``relationship`` uppercases and must be
  DIRECT or RESELLER (the spec tells consumers to ignore others);
  a 4th field is the cert authority id (missing -> None);
- ``line_no`` is the 1-based physical line number (comments and
  blanks keep their numbers — provenance for audits).

The distributed twin in ``operators/adstxt.py`` re-expresses these
steps as JVM split/transform plans, and the DuckDB oracle is
generated from the same constants — the PII-family triple check.

Reference anchor: loaders.py per-format dispatch (semantic analog;
the reference has no crawl-side well-known readers).
"""

from __future__ import annotations

import re

# shared constants (generated into the Spark plan and DuckDB SQL)
COMMENT_RE = r"#.*"
TRIM_RE = r"^[ \t]+|[ \t]+$"
RELATIONSHIPS = ("DIRECT", "RESELLER")

_COMMENT = re.compile(COMMENT_RE)
_TRIM = re.compile(TRIM_RE)


def _trim(s: str) -> str:
    return _TRIM.sub("", s)


def parse_ads_txt(text: str):
    """-> (records, variables):
    records:  [(line_no, ad_domain, publisher_id, relationship,
                cert_id|None)]
    variables:[(line_no, name_upper, value)]"""
    records: list[tuple] = []
    variables: list[tuple] = []
    for line_no, raw in enumerate((text or "").split("\n"), start=1):
        line = _trim(_COMMENT.sub("", raw.replace("\r", "")))
        if not line:
            continue
        if "," not in line and "=" in line:
            name, _, value = line.partition("=")
            name = _trim(name).upper()
            value = _trim(value)
            if name and value:
                variables.append((line_no, name, value))
            continue
        fields = [_trim(f) for f in line.split(",")]
        if len(fields) < 3 or not fields[0] or not fields[1]:
            continue
        rel = fields[2].upper()
        if rel not in RELATIONSHIPS:
            continue
        cert = fields[3] if len(fields) > 3 and fields[3] else None
        records.append((line_no, fields[0].lower(), fields[1],
                        rel, cert))
    return records, variables
