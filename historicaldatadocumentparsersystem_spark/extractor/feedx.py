"""Sitemap / RSS / Atom parsing — Spark-free, stdlib-only.

URL discovery is the stage BEFORE fetching: crawlers learn what to
fetch from sitemaps (robots.txt's ``Sitemap:`` lines point at them)
and from syndication feeds. This module turns those XML documents
into frontier rows for ``sources.read_sitemap_urls`` /
``read_feed_entries``; ``webtext.frontier_candidates`` then
anti-joins them against the CDX capture index to find never-captured
URLs.

The parser is the repo's regex tag scanner (same strategy as
``extractor.htmlx``): machine-generated sitemap/feed XML is scanned
for ``<url>``/``<sitemap>``/``<item>``/``<entry>`` blocks and their
child fields — O(n), deterministic, and it degrades on malformed or
truncated input instead of raising (the F5 contract; a DOM XML parser
would throw on the first bad byte). Like the rest of ``extractor/``,
these functions are the correctness oracle the Spark readers call.

Reference analog: the reference ingests a hand-given directory of
files (`main_parser.py`); at crawl scale the list of what to ingest
is itself harvested from sitemaps/feeds and is a dataset.
"""
from __future__ import annotations

import re
import zlib
from datetime import datetime, timezone
from html import unescape

_GZIP_MAGIC = b"\x1f\x8b"

_BLOCK_RE = re.compile(
    rb"<(url|sitemap|item|entry)[\s>](.*?)</\1\s*>",
    re.S | re.I)
_FIELD_RES: dict[str, re.Pattern] = {}


def _field(block: bytes, tag: str) -> str | None:
    """First <tag>...</tag> text inside the block, entity-unescaped
    and stripped; None when absent/empty."""
    pat = _FIELD_RES.get(tag)
    if pat is None:
        pat = re.compile(
            (r"<%s(?:\s[^>]*)?>(.*?)</%s\s*>" % (tag, tag)).encode(),
            re.S | re.I)
        _FIELD_RES[tag] = pat
    m = pat.search(block)
    if not m:
        return None
    text = unescape(
        m.group(1).decode("utf-8", errors="replace")).strip()
    return text or None


_ATOM_LINK_RE = re.compile(
    rb"<link\b[^>]*\bhref\s*=\s*[\"']([^\"']*)[\"']", re.I)


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == _GZIP_MAGIC:
        try:
            return zlib.decompress(data, wbits=47)
        except zlib.error:
            return b""
    return data


def _w3c_ts(s: str | None) -> datetime | None:
    """W3C datetime (sitemap <lastmod>, Atom <updated>): date-only or
    full timestamp, 'Z' or numeric offset; None on anything else."""
    if not s:
        return None
    for fmt in ("%Y-%m-%d", "%Y-%m-%dT%H:%M:%S%z",
                "%Y-%m-%dT%H:%M:%S.%f%z"):
        try:
            dt = datetime.strptime(s.replace("Z", "+0000"), fmt)
        except ValueError:
            continue
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)
    return None


def _rfc822_ts(s: str | None) -> datetime | None:
    """RFC 822/1123 datetime (RSS <pubDate>); None on junk."""
    if not s:
        return None
    from email.utils import parsedate_to_datetime
    try:
        dt = parsedate_to_datetime(s)
    except (ValueError, TypeError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def parse_sitemap(data: bytes) -> list[dict]:
    """All entries of a sitemap document (urlset OR sitemapindex;
    plain or whole-file gzip — ``sitemap.xml.gz`` is the norm), in
    order: {kind ('url' | 'sitemap'), loc, lastmod (datetime | None),
    changefreq (str | None), priority_bp (int | None)}.

    ``priority_bp`` is the 0.0–1.0 sitemap priority in integer basis
    points (0–10000) — float-free so downstream ordering is exact
    cross-engine. Blocks without a <loc> are dropped; unparsable
    lastmod/priority degrade to None (F5: lossy rows, never raise).
    """
    data = _maybe_gunzip(data)
    out: list[dict] = []
    for m in _BLOCK_RE.finditer(data):
        kind = m.group(1).decode().lower()
        if kind not in ("url", "sitemap"):
            continue
        block = m.group(2)
        loc = _field(block, "loc")
        if not loc:
            continue
        pr = None
        raw_pr = _field(block, "priority")
        if raw_pr:
            try:
                pr = round(float(raw_pr) * 10000)
            except ValueError:
                pr = None
            else:
                pr = pr if 0 <= pr <= 10000 else None
        cf = _field(block, "changefreq")
        out.append({
            "kind": kind,
            "loc": loc,
            "lastmod": _w3c_ts(_field(block, "lastmod")),
            "changefreq": cf.lower() if cf else None,
            "priority_bp": pr,
        })
    return out


_MEDIA_BLOCK_RE = re.compile(
    rb"<(video:video|image:image)\s*>(.*?)</\1\s*>", re.S | re.I)


def parse_sitemap_media(data: bytes) -> list[dict]:
    """All media-extension entries of a sitemap (the Google
    video/image sitemap extensions — the crawl-side DISCOVERY channel
    for multimodal pair mining, complementing the in-page
    extract_images/extract_av passes), in order:
    {page_loc, pos, kind ('video' | 'image'), loc, thumbnail_loc,
    title, description, duration_s}.

    Per ``<url>`` block with a ``<loc>``, each ``<video:video>`` /
    ``<image:image>`` sub-block becomes a row (``pos`` dense from 0
    per page across both kinds, document order). Video rows take
    ``video:content_loc`` (falling back to ``video:player_loc``),
    ``video:thumbnail_loc``, ``video:title``, ``video:description``
    and ``video:duration`` (seconds, kept only in the spec's
    0..28800 range); image rows take ``image:loc``, ``image:title``
    and ``image:caption`` (as description). The canonical namespace
    prefixes are part of the contract (Google's own examples); media
    blocks without a usable loc are dropped; whole-file gzip undone;
    malformed documents degrade to fewer rows (F5)."""
    data = _maybe_gunzip(data)
    out: list[dict] = []
    for m in _BLOCK_RE.finditer(data):
        if m.group(1).decode().lower() != "url":
            continue
        block = m.group(2)
        page = _field(block, "loc")
        if not page:
            continue
        pos = 0
        for mm in _MEDIA_BLOCK_RE.finditer(block):
            kind = mm.group(1).decode().lower().split(":")[0]
            sub = mm.group(2)
            if kind == "video":
                loc = _field(sub, "video:content_loc") \
                    or _field(sub, "video:player_loc")
                thumb = _field(sub, "video:thumbnail_loc")
                title = _field(sub, "video:title")
                desc = _field(sub, "video:description")
                dur = None
                raw = _field(sub, "video:duration")
                if raw:
                    try:
                        dur = int(raw)
                    except ValueError:
                        dur = None
                    else:
                        dur = dur if 0 <= dur <= 28800 else None
            else:
                loc = _field(sub, "image:loc")
                thumb = None
                title = _field(sub, "image:title")
                desc = _field(sub, "image:caption")
                dur = None
            if not loc:
                continue
            out.append({"page_loc": page, "pos": pos, "kind": kind,
                        "loc": loc, "thumbnail_loc": thumb,
                        "title": title, "description": desc,
                        "duration_s": dur})
            pos += 1
    return out


def build_sitemap_media(pages: list[dict],
                        gzip_file: bool = False) -> bytes:
    """Serialize {page_loc, media: [row dicts]} pages into a valid
    media-extension sitemap — fixture generator + exactness witness
    (build -> parse_sitemap_media round-trips every field)."""
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<urlset xmlns="http://www.sitemaps.org/schemas/'
             'sitemap/0.9" xmlns:video="http://www.google.com/'
             'schemas/sitemap-video/1.1" xmlns:image="http://'
             'www.google.com/schemas/sitemap-image/1.1">']
    for p in pages:
        lines.append("<url>")
        lines.append("<loc>%s</loc>" % _xml_escape(p["page_loc"]))
        for r in p.get("media", ()):
            if r["kind"] == "video":
                lines.append("<video:video>")
                if r.get("loc"):
                    lines.append("<video:content_loc>%s"
                                 "</video:content_loc>"
                                 % _xml_escape(r["loc"]))
                if r.get("thumbnail_loc"):
                    lines.append("<video:thumbnail_loc>%s"
                                 "</video:thumbnail_loc>"
                                 % _xml_escape(r["thumbnail_loc"]))
                if r.get("title") is not None:
                    lines.append("<video:title>%s</video:title>"
                                 % _xml_escape(r["title"]))
                if r.get("description") is not None:
                    lines.append("<video:description>%s"
                                 "</video:description>"
                                 % _xml_escape(r["description"]))
                if r.get("duration_s") is not None:
                    lines.append("<video:duration>%d</video:duration>"
                                 % r["duration_s"])
                lines.append("</video:video>")
            else:
                lines.append("<image:image>")
                lines.append("<image:loc>%s</image:loc>"
                             % _xml_escape(r["loc"]))
                if r.get("title") is not None:
                    lines.append("<image:title>%s</image:title>"
                                 % _xml_escape(r["title"]))
                if r.get("description") is not None:
                    lines.append("<image:caption>%s</image:caption>"
                                 % _xml_escape(r["description"]))
                lines.append("</image:image>")
        lines.append("</url>")
    lines.append("</urlset>")
    out = "\n".join(lines).encode("utf-8")
    if gzip_file:
        c = zlib.compressobj(wbits=31)
        out = c.compress(out) + c.flush()
    return out


def parse_feed(data: bytes) -> list[dict]:
    """All entries of an RSS 2.0, Atom or JSON Feed, in order:
    {feed_kind ('rss' | 'atom' | 'json'), url, title (str | None),
    pub_ts (datetime | None)}.

    RSS items use <link> text + <pubDate> (RFC 822); Atom entries use
    <link href=...> + <updated> (W3C); a payload whose first
    non-space byte is ``{`` dispatches to the JSON Feed parser (every
    discovery channel — batch reader, streaming discovery, enclosure
    miner — becomes JSON-Feed-capable through this one branch).
    Entries without a resolvable url are dropped; bad dates degrade
    to None (F5).
    """
    data = _maybe_gunzip(data)
    if data.lstrip()[:1] == b"{":
        return parse_json_feed(data)
    out: list[dict] = []
    for m in _BLOCK_RE.finditer(data):
        kind = m.group(1).decode().lower()
        block = m.group(2)
        if kind == "item":
            url = _field(block, "link")
            if not url:
                continue
            out.append({"feed_kind": "rss", "url": url,
                        "title": _field(block, "title"),
                        "pub_ts": _rfc822_ts(_field(block, "pubDate"))})
        elif kind == "entry":
            lm = _ATOM_LINK_RE.search(block)
            if not lm:
                continue
            url = unescape(
                lm.group(1).decode("utf-8", errors="replace")).strip()
            if not url:
                continue
            out.append({"feed_kind": "atom", "url": url,
                        "title": _field(block, "title"),
                        "pub_ts": _w3c_ts(_field(block, "updated"))})
    return out


_ENC_RE = re.compile(
    rb"<enclosure\b[^>]*>", re.I)
_ENC_ATTR_RE = re.compile(
    rb"([a-zA-Z:]+)\s*=\s*[\"']([^\"']*)[\"']")
_ATOM_ENC_RE = re.compile(
    rb"<link\b[^>]*\brel\s*=\s*[\"']enclosure[\"'][^>]*>", re.I)


def _itunes_ms(s: str | None) -> int | None:
    """<itunes:duration>: 'HH:MM:SS' / 'MM:SS' / bare seconds ->
    exact integer ms; None on junk/absurd."""
    if not s:
        return None
    parts = s.strip().split(":")
    if not 1 <= len(parts) <= 3 or not all(p.isdigit() for p in parts):
        return None
    secs = 0
    for p in parts:
        secs = secs * 60 + int(p)
    ms = secs * 1000
    return ms if ms < (1 << 62) else None


def parse_feed_enclosures(data: bytes) -> list[dict]:
    """One row per media attachment — the podcast/audio discovery
    channel (the RSS sibling of sitemap_media): RSS ``<enclosure>``
    and Atom ``<link rel=enclosure>``, in order:
    {feed_kind, page_url, pos, url, mime, length_bytes, duration_ms}.

    ``page_url`` is the owning item/entry link (rows without one are
    dropped, the parse_feed rule); ``length_bytes`` is the declared
    size clamped to [0, 2^62) -> None outside; ``duration_ms`` comes
    from the item's ``<itunes:duration>`` (exact HH:MM:SS / MM:SS /
    seconds arithmetic, RSS only); attachment tags without a url are
    dropped; malformed documents degrade to fewer rows (F5). A JSON
    Feed payload (first non-space byte ``{``) dispatches to
    ``parse_json_feed_attachments`` — same row shape."""
    data = _maybe_gunzip(data)
    if data.lstrip()[:1] == b"{":
        return parse_json_feed_attachments(data)
    out: list[dict] = []
    for m in _BLOCK_RE.finditer(data):
        kind = m.group(1).decode().lower()
        block = m.group(2)
        if kind == "item":
            page = _field(block, "link")
            feed_kind, encs = "rss", _ENC_RE.finditer(block)
            dur = _itunes_ms(_field(block, "itunes:duration"))
        elif kind == "entry":
            lm = _ATOM_LINK_RE.search(block)
            page = (unescape(lm.group(1).decode("utf-8", "replace"))
                    .strip() if lm else None)
            feed_kind, encs = "atom", _ATOM_ENC_RE.finditer(block)
            dur = None
        else:
            continue
        if not page:
            continue
        pos = 0
        for em in encs:
            attrs = {k.decode("ascii", "replace").lower():
                     unescape(v.decode("utf-8", "replace")).strip()
                     for k, v in _ENC_ATTR_RE.findall(em.group(0))}
            url = attrs.get("url") or attrs.get("href")
            if not url:
                continue
            try:
                length = int(attrs["length"])
            except (KeyError, ValueError):
                length = None
            if length is not None and not 0 <= length < (1 << 62):
                length = None
            out.append({"feed_kind": feed_kind, "page_url": page,
                        "pos": pos, "url": url,
                        "mime": attrs.get("type") or None,
                        "length_bytes": length, "duration_ms": dur})
            pos += 1
    return out


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def build_sitemap(entries: list[dict], gzip_file: bool = False) -> bytes:
    """Serialize entries (same dict shape parse_sitemap returns) into
    a valid sitemap document — fixture generator + exactness witness
    (build_sitemap -> parse_sitemap round-trips every field)."""
    is_index = entries and entries[0]["kind"] == "sitemap"
    root = "sitemapindex" if is_index else "urlset"
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<%s xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
             % root]
    for e in entries:
        lines.append("<%s>" % e["kind"])
        lines.append("<loc>%s</loc>" % _xml_escape(e["loc"]))
        if e.get("lastmod") is not None:
            lines.append("<lastmod>%s</lastmod>" %
                         e["lastmod"].strftime("%Y-%m-%dT%H:%M:%S+00:00"))
        if e.get("changefreq"):
            lines.append("<changefreq>%s</changefreq>" % e["changefreq"])
        if e.get("priority_bp") is not None:
            lines.append("<priority>%.4f</priority>" %
                         (e["priority_bp"] / 10000.0))
        lines.append("</%s>" % e["kind"])
    lines.append("</%s>" % root)
    out = "\n".join(lines).encode("utf-8")
    if gzip_file:
        c = zlib.compressobj(wbits=31)
        out = c.compress(out) + c.flush()
    return out


def build_feed(entries: list[dict], gzip_file: bool = False) -> bytes:
    """Serialize entries (same dict shape parse_feed returns) into an
    RSS 2.0 or Atom feed (per entry feed_kind of the FIRST entry) —
    fixture generator + exactness witness."""
    is_atom = entries and entries[0]["feed_kind"] == "atom"
    lines = ['<?xml version="1.0" encoding="UTF-8"?>']
    if is_atom:
        lines.append('<feed xmlns="http://www.w3.org/2005/Atom">')
        for e in entries:
            lines.append("<entry>")
            if e.get("title") is not None:
                lines.append("<title>%s</title>" %
                             _xml_escape(e["title"]))
            lines.append('<link href="%s"/>' % _xml_escape(e["url"]))
            if e.get("pub_ts") is not None:
                lines.append("<updated>%s</updated>" %
                             e["pub_ts"].strftime(
                                 "%Y-%m-%dT%H:%M:%S+00:00"))
            enc = e.get("enclosure")
            if enc:
                lines.append(
                    '<link rel="enclosure" href="%s" length="%s" '
                    'type="%s"/>' % (_xml_escape(enc["url"]),
                                     enc.get("length", ""),
                                     enc.get("mime", "")))
            lines.append("</entry>")
        lines.append("</feed>")
    else:
        lines.append('<rss version="2.0"><channel>')
        for e in entries:
            lines.append("<item>")
            if e.get("title") is not None:
                lines.append("<title>%s</title>" %
                             _xml_escape(e["title"]))
            lines.append("<link>%s</link>" % _xml_escape(e["url"]))
            if e.get("pub_ts") is not None:
                lines.append("<pubDate>%s</pubDate>" %
                             e["pub_ts"].strftime(
                                 "%a, %d %b %Y %H:%M:%S +0000"))
            enc = e.get("enclosure")
            if enc:
                lines.append(
                    '<enclosure url="%s" length="%s" type="%s"/>'
                    % (_xml_escape(enc["url"]),
                       enc.get("length", ""),
                       enc.get("mime", "")))
            if e.get("itunes_duration"):
                lines.append("<itunes:duration>%s</itunes:duration>"
                             % e["itunes_duration"])
            lines.append("</item>")
        lines.append("</channel></rss>")
    out = "\n".join(lines).encode("utf-8")
    if gzip_file:
        c = zlib.compressobj(wbits=31)
        out = c.compress(out) + c.flush()
    return out


# --- OPML (feed subscription lists) ------------------------------------------
# The discovery bridge's third leg: robots.txt points at sitemaps,
# feeds surface fresh urls, and OPML files enumerate whole feed
# COLLECTIONS (blogrolls, podcast subscriptions, "awesome feeds"
# lists) — one OPML seed fans out into hundreds of feeds for
# read_feed_entries to poll.

_OPML_TAG_RE = re.compile(rb"<(/?)outline\b([^>]*?)(/?)\s*>", re.I | re.S)
_ATTR_RE = re.compile(
    rb"""([A-Za-z][\w:-]*)\s*=\s*("([^"]*)"|'([^']*)')""")


def _attrs(raw: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        val = m.group(3) if m.group(3) is not None else m.group(4)
        out[m.group(1).decode("ascii", errors="replace").lower()] = \
            unescape(val.decode("utf-8", errors="replace")).strip()
    return out


def parse_opml(data: bytes) -> list[dict]:
    """All feed rows of an OPML subscription list, in document order:
    {pos, category, title, xml_url, html_url}.

    ``category`` is the "/"-joined text of the enclosing folder
    outlines (an outline WITHOUT an xmlUrl is a folder; one WITH an
    xmlUrl is a feed — the de-facto OPML 2.0 convention). Attributes
    accept single or double quotes, entities unescape, ``text`` falls
    back to ``title``; feeds without an xmlUrl never emit; malformed
    documents degrade to fewer rows, never raise (F5). Plain or
    whole-file gzip, like the sitemap reader.
    """
    data = _maybe_gunzip(data)
    out: list[dict] = []
    stack: list[str] = []
    for m in _OPML_TAG_RE.finditer(data):
        closing, raw, selfclose = m.group(1), m.group(2), m.group(3)
        if closing:
            if stack:
                stack.pop()
            continue
        a = _attrs(raw)
        title = a.get("text") or a.get("title") or ""
        xml_url = a.get("xmlurl")
        if xml_url:
            out.append({
                "pos": len(out),
                "category": "/".join(s for s in stack if s),
                "title": title or None,
                "xml_url": xml_url,
                "html_url": a.get("htmlurl"),
            })
        if not selfclose:
            stack.append(title)
    return out


def build_opml(tree: list, title: str = "subscriptions",
               gzip_file: bool = False) -> bytes:
    """Serialize a nested outline tree into an OPML 2.0 document —
    fixture generator + exactness witness (build_opml -> parse_opml
    round-trips every feed row). ``tree`` items are either
    ("folder-title", [children...]) folders or
    {"title", "xml_url", "html_url"} feed dicts."""
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<opml version="2.0">',
             "<head><title>%s</title></head>" % _xml_escape(title),
             "<body>"]

    def walk(items: list) -> None:
        for it in items:
            if isinstance(it, tuple):
                name, children = it
                lines.append('<outline text="%s">' % _xml_escape(name))
                walk(children)
                lines.append("</outline>")
            else:
                attrs = ['text="%s"' % _xml_escape(it.get("title") or "")]
                attrs.append('type="rss"')
                attrs.append('xmlUrl="%s"' % _xml_escape(it["xml_url"]))
                if it.get("html_url"):
                    attrs.append('htmlUrl="%s"'
                                 % _xml_escape(it["html_url"]))
                lines.append("<outline %s/>" % " ".join(attrs))

    walk(tree)
    lines += ["</body>", "</opml>"]
    out = "\n".join(lines).encode("utf-8")
    if gzip_file:
        c = zlib.compressobj(wbits=31)
        out = c.compress(out) + c.flush()
    return out


# --- JSON Feed (jsonfeed.org v1 / v1.1) --------------------------------------

def _json_feed_doc(data: bytes):
    """Decode + validate the JSON Feed envelope: a JSON object whose
    ``version`` starts with the jsonfeed.org URI and whose ``items``
    is a list. Anything else -> None (F5)."""
    import json
    try:
        doc = json.loads(_maybe_gunzip(data))
    except (ValueError, UnicodeDecodeError):
        return None
    if not isinstance(doc, dict):
        return None
    version = doc.get("version")
    if not (isinstance(version, str)
            and version.startswith("https://jsonfeed.org/version/")):
        return None
    if not isinstance(doc.get("items"), list):
        return None
    return doc


def parse_json_feed(data: bytes) -> list[dict]:
    """All items of a JSON Feed, in order, in the ``parse_feed`` row
    shape ({feed_kind 'json', url, title, pub_ts}) so the discovery
    union merges channels without adapters. The item url is ``url``
    with ``external_url`` as fallback (the spec's two permalink
    fields); items without one drop; ``date_published`` is RFC 3339
    (the _w3c_ts grammar), bad dates degrade to None (F5)."""
    doc = _json_feed_doc(data)
    if doc is None:
        return []
    out: list[dict] = []
    for item in doc["items"]:
        if not isinstance(item, dict):
            continue
        url = item.get("url") or item.get("external_url")
        if not isinstance(url, str) or not url.strip():
            continue
        title = item.get("title")
        pub = item.get("date_published")
        out.append({
            "feed_kind": "json", "url": url.strip(),
            "title": title if isinstance(title, str) and title
            else None,
            "pub_ts": _w3c_ts(pub if isinstance(pub, str) else None)})
    return out


def parse_json_feed_attachments(data: bytes) -> list[dict]:
    """One row per item attachment, in the ``parse_feed_enclosures``
    row shape ({feed_kind 'json', page_url, pos, url, mime,
    length_bytes, duration_ms}): ``size_in_bytes`` clamps to
    [0, 2^62) -> None outside (the attribute-fed-allocation rule),
    ``duration_in_seconds`` folds to exact integer ms; attachments
    without a url drop; items without a page url drop (the
    parse_feed rule)."""
    doc = _json_feed_doc(data)
    if doc is None:
        return []
    out: list[dict] = []
    for item in doc["items"]:
        if not isinstance(item, dict):
            continue
        page = item.get("url") or item.get("external_url")
        if not isinstance(page, str) or not page.strip():
            continue
        pos = 0
        for att in (item.get("attachments") or []) \
                if isinstance(item.get("attachments"), list) else []:
            if not isinstance(att, dict):
                continue
            url = att.get("url")
            if not isinstance(url, str) or not url.strip():
                continue
            length = att.get("size_in_bytes")
            if not isinstance(length, int) or isinstance(length, bool) \
                    or not 0 <= length < (1 << 62):
                length = None
            dur = att.get("duration_in_seconds")
            dur_ms = (dur * 1000 if isinstance(dur, int)
                      and not isinstance(dur, bool)
                      and 0 <= dur < (1 << 42) else None)
            mime = att.get("mime_type")
            out.append({"feed_kind": "json", "page_url": page.strip(),
                        "pos": pos, "url": url.strip(),
                        "mime": mime if isinstance(mime, str) and mime
                        else None,
                        "length_bytes": length,
                        "duration_ms": dur_ms})
            pos += 1
    return out


def build_json_feed(title: str, items: list[dict],
                    home_page_url: str | None = None,
                    version: str = "https://jsonfeed.org/version/1.1",
                    gzip_file: bool = False) -> bytes:
    """Fixture generator: items are dicts with optional url /
    external_url / title / date_published / attachments (dicts with
    url / mime_type / size_in_bytes / duration_in_seconds). Sorted
    keys -> byte-deterministic."""
    import json
    doc: dict = {"version": version, "title": title, "items": items}
    if home_page_url is not None:
        doc["home_page_url"] = home_page_url
    out = json.dumps(doc, sort_keys=True).encode()
    if gzip_file:
        import zlib
        c = zlib.compressobj(wbits=31)
        out = c.compress(out) + c.flush()
    return out
