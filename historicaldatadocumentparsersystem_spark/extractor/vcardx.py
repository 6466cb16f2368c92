"""vCard (RFC 6350 / 2426 / 2.1) contact reader — pure Python,
Spark-free.

The contact sibling of ``icsx`` (same content-line grammar family):
address books surface in crawls as ``.vcf`` downloads, hCard
exports, and contact attachments. Reuses icsx's line unfolding,
payload decode, and TEXT unescaping; the parameter scan is its OWN
because vCard needs what iCalendar's parser drops — repeated
``TYPE=`` parameters (RFC 2426) and vCard 2.1 BARE parameter tokens
(``TEL;HOME;VOICE:``), both of which collect into the type list.

Flat property model (the bibtex_fields pattern): one row per
property per card, in source order —

- cards are ``BEGIN:VCARD``..``END:VCARD`` blocks (case-insensitive
  names); an unterminated trailing card is DROPPED (RFC requires the
  END sentinel; a truncated download should not half-count);
- property group prefixes (``item1.TEL``) split off into ``grp``
  (lowercased); property names uppercase;
- types: lowercase, encounter order, comma-joined (``TYPE=HOME``,
  ``TYPE=a,b`` comma lists, and 2.1 bare tokens all merge); None
  when no types;
- values are TEXT-unescaped (``\\n``/``\\,``/``\\;``/``\\\\``);
  VERSION rows are kept (the rollups read them), BEGIN/END
  sentinels are not emitted.
"""

from __future__ import annotations

from .icsx import _decode
from .icsx import unescape_text as _unescape
from .icsx import unfold_lines


def _split_line(line: str):
    """``GRP.NAME;TYPE=a,b;HOME:value`` -> (name, [types], value) or
    None when no unquoted colon terminates the head."""
    in_quote = False
    colon = -1
    for i, ch in enumerate(line):
        if ch == '"':
            in_quote = not in_quote
        elif ch == ":" and not in_quote:
            colon = i
            break
    if colon < 0:
        return None
    head, value = line[:colon], line[colon + 1:]
    parts: list[str] = []
    buf: list[str] = []
    in_quote = False
    for ch in head:
        if ch == '"':
            in_quote = not in_quote
            buf.append(ch)
        elif ch == ";" and not in_quote:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    name = parts[0].strip().upper()
    if not name:
        return None
    types: list[str] = []
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            if k.strip().upper() != "TYPE":
                continue  # VALUE=/CHARSET=/PREF= not the flat view
            toks = v.strip().strip('"').split(",")
        else:
            toks = p.split(",")  # vCard 2.1 bare tokens
        for t in toks:
            t = t.strip().lower()
            if t and t not in types:
                types.append(t)
    return name, types, value


def parse_vcards(payload) -> list[dict]:
    """payload -> [{"idx": card index, "props": [(pos, grp, name,
    types, value), ...]}, ...]; never raises."""
    if payload is None:
        return []
    if isinstance(payload, str):
        src = payload
    else:
        try:
            src = _decode(bytes(payload))
        except Exception:
            return []
    cards: list[dict] = []
    cur: list | None = None
    for line in unfold_lines(src):
        parsed = _split_line(line)
        if parsed is None:
            continue
        name, types, value = parsed
        if name == "BEGIN" and value.strip().upper() == "VCARD":
            cur = []
            continue
        if name == "END" and value.strip().upper() == "VCARD":
            if cur is not None:
                cards.append({"idx": len(cards), "props": cur})
            cur = None
            continue
        if cur is None:
            continue
        grp = None
        if "." in name:
            grp, name = name.split(".", 1)
            grp = grp.lower()
        cur.append((len(cur), grp, name,
                    ",".join(types) or None, _unescape(value)))
    return cards


def build_vcard(cards: list[list[str]], width: int = 60) -> bytes:
    """Encode half for fixtures: each card is a list of raw content
    lines (without BEGIN/END); long lines fold with CRLF + space
    (RFC 6350 §3.2 — unfolding is content-agnostic, so any split
    point round-trips). Must decode through parse_vcards."""
    out: list[str] = []
    for lines in cards:
        out.append("BEGIN:VCARD")
        for line in lines:
            while len(line) > width:
                out.append(line[:width])
                line = " " + line[width:]
            out.append(line)
        out.append("END:VCARD")
    return ("\r\n".join(out) + "\r\n").encode("utf-8")
