"""User-agent classification — pure Python, from scratch,
Spark-free.

The request-side sibling of the access-log reader: mapping UA
strings to (browser family, major version, OS, bot-ness) is how log
analytics separates crawler fleets from human traffic. Rules are
DATA (the tuples below), shared verbatim by three engines:

- this module's :func:`classify` (the oracle / golden derivation),
- ``operators/uaclass.py`` compiling the SAME tuples to Spark
  CASE/when chains of JVM builtins,
- the DuckDB twin SQL generated from the SAME tuples in
  ``__spark_entry__`` (the soft404/host_security_posture precedent:
  constants are generated into SQL, never hand-retyped).

Matching is deliberately SUBSTRING-based (case-sensitive for
browser/OS tokens — real UA grammar capitalizes product tokens;
lowercased for bot markers) so every engine agrees bit-for-bit:
first rule whose ``any_of`` hits, with every ``all_of`` present and
no ``none_of`` present, wins. Version regexes use alternation-order
preference, identical in Java regex and RE2.
"""

from __future__ import annotations

import re

# (family, any_of, all_of, none_of, version_regexes) — rule ORDER
# matters: Edge/Opera/Samsung carry "Chrome/" too; Chrome carries
# "Safari/"; real Safari is gated on its "Version/" token. The
# version regexes are tried IN ORDER (first with a match wins —
# coalesce in the SQL engines): Presto-era Opera reports its real
# version in "Version/", not "Opera/9.80".
BROWSER_RULES: tuple[tuple, ...] = (
    ("edge", ("Edg/", "Edge/", "EdgA/", "EdgiOS/"), (), (),
     (r"(?:Edge|EdgiOS|EdgA|Edg)/([0-9]{1,9})",)),
    ("opera", ("OPR/", "Opera"), (), (),
     (r"OPR/([0-9]{1,9})", r"Version/([0-9]{1,9})",
      r"Opera[/ ]([0-9]{1,9})")),
    ("samsung", ("SamsungBrowser/",), (), (),
     (r"SamsungBrowser/([0-9]{1,9})",)),
    ("firefox", ("Firefox/", "FxiOS/"), (), ("Seamonkey/",),
     (r"(?:Firefox|FxiOS)/([0-9]{1,9})",)),
    ("chrome", ("Chrome/", "Chromium/", "CriOS/"), (), (),
     (r"(?:Chrome|Chromium|CriOS)/([0-9]{1,9})",)),
    ("safari", ("Safari/",), ("Version/",), (),
     (r"Version/([0-9]{1,9})",)),
    ("ie", ("MSIE ", "Trident/"), (), (),
     (r"MSIE ([0-9]{1,9})", r"rv:([0-9]{1,9})")),
)

# (os, any_of) — iOS before macOS ("like Mac OS X"), Android before
# Linux (Android UAs carry "Linux").
OS_RULES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("ios", ("iPhone", "iPad", "iPod")),
    ("android", ("Android",)),
    ("macos", ("Mac OS X", "Macintosh")),
    ("windows", ("Windows NT", "Windows ")),
    ("linux", ("Linux", "X11;")),
)

# lowercased substring markers; a UA containing any is a bot
BOT_MARKERS: tuple[str, ...] = (
    "bot", "crawler", "spider", "slurp", "archiver", "fetcher",
    "scrapy", "curl/", "wget/", "python-requests", "python-urllib",
    "go-http-client", "headlesschrome", "phantomjs", "facebookexternalhit")

# captures the marker-bearing token as the bot's name (run over the
# LOWERCASED ua; '' -> no name even when a marker hit)
BOT_NAME_RE = r"([a-z0-9_.\-]*(?:bot|crawler|spider|slurp))"


def classify(ua) -> tuple:
    """ua -> (family, version_major, os, is_bot, bot_name); all
    None for a None input. The reference semantics every engine is
    pinned against."""
    if ua is None:
        return (None, None, None, None, None)
    s = str(ua)
    family = version = None
    for fam, any_of, all_of, none_of, vres in BROWSER_RULES:
        if (any(n in s for n in any_of)
                and all(n in s for n in all_of)
                and not any(n in s for n in none_of)):
            family = fam
            for vre in vres:
                m = re.search(vre, s)
                if m:
                    version = int(m.group(1))
                    break
            break
    os_name = None
    for osn, any_of in OS_RULES:
        if any(n in s for n in any_of):
            os_name = osn
            break
    low = s.lower()
    is_bot = any(m in low for m in BOT_MARKERS)
    bot_name = None
    if is_bot:
        m = re.search(BOT_NAME_RE, low)
        if m and m.group(1):
            bot_name = m.group(1)
    return (family, version, os_name, is_bot, bot_name)
