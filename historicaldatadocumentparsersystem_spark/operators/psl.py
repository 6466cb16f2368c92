"""Trimmed public-suffix list for registrable-domain extraction.

A curated subset of the Mozilla Public Suffix List (publicsuffix.org —
public data, hand-trimmed to the high-traffic ccTLD registration
hierarchies a web crawl actually hits). The full PSL is a drop-in
replacement: regenerate ``SUFFIX_2`` / ``SUFFIX_3`` from the dat file
and the lookup logic in ``webtext.url_domain`` is unchanged.

Why it matters at corpus scale: host caps and per-domain stats keyed on
a naive last-two-label rule collapse every ``*.co.uk`` / ``*.com.au``
site into one "domain", so one hot pseudo-domain absorbs entire
countries (reference's single-process code never aggregates by domain,
so it never hits this).

Only exact-match rules are kept (no ``*.ck``-style wildcard or ``!``
exception rules — none of the trimmed entries need them).
"""

from __future__ import annotations

_UK = ("co", "org", "ac", "gov", "me", "net", "ltd", "plc", "sch", "nhs")
_AU = ("com", "net", "org", "edu", "gov", "id", "asn")
_JP = ("co", "ne", "or", "ac", "ad", "go", "ed", "gr", "lg")
_NZ = ("co", "net", "org", "govt", "ac", "geek", "gen", "school", "kiwi")
_ZA = ("co", "net", "org", "gov", "ac", "web", "edu")
_BR = ("com", "net", "org", "gov", "edu", "art", "blog", "eco", "mil")
_CN = ("com", "net", "org", "gov", "edu", "ac", "mil")
_IN = ("co", "net", "org", "gov", "ac", "res", "gen", "firm", "ind", "edu")
_KR = ("co", "ne", "or", "go", "ac", "re", "pe", "mil")
_TR = ("com", "net", "org", "gov", "edu", "mil", "bel", "web")
_TW = ("com", "net", "org", "gov", "edu", "idv", "mil")
_MX = ("com", "net", "org", "gob", "edu")
_AR = ("com", "net", "org", "gob", "edu", "mil", "int")
_PL = ("com", "net", "org", "edu", "gov", "mil", "waw", "info", "biz")
_UA = ("com", "net", "org", "gov", "edu", "in", "kiev", "kyiv")
_TH = ("co", "net", "or", "go", "ac", "in", "mi")
_ID = ("co", "web", "or", "ac", "go", "sch", "my", "biz", "desa")
_IL = ("co", "net", "org", "gov", "ac", "muni", "idf")
_KE = ("co", "or", "ne", "go", "ac", "sc", "info", "me", "mobi")

_BY_CC = {
    "uk": _UK, "au": _AU, "jp": _JP, "nz": _NZ, "za": _ZA, "br": _BR,
    "cn": _CN, "in": _IN, "kr": _KR, "tr": _TR, "tw": _TW, "mx": _MX,
    "ar": _AR, "pl": _PL, "ua": _UA, "th": _TH, "id": _ID, "il": _IL,
    "ke": _KE,
    "sg": ("com", "net", "org", "gov", "edu"),
    "my": ("com", "net", "org", "gov", "edu", "mil"),
    "hk": ("com", "net", "org", "gov", "edu", "idv"),
    "ph": ("com", "net", "org", "gov", "edu", "ngo"),
    "vn": ("com", "net", "org", "gov", "edu", "int", "ac", "biz", "info"),
    "eg": ("com", "net", "org", "gov", "edu", "sci", "mil"),
    "sa": ("com", "net", "org", "gov", "edu", "med", "sch", "pub"),
    "ng": ("com", "net", "org", "gov", "edu", "sch", "mil", "mobi", "i"),
    "pk": ("com", "net", "org", "gov", "edu", "gob", "gok", "web", "fam"),
    "bd": ("com", "net", "org", "gov", "edu", "ac", "mil"),
    "pe": ("com", "net", "org", "gob", "edu", "mil", "nom", "sld"),
    "ve": ("com", "net", "org", "gob", "edu", "mil", "web", "info", "co"),
    "co": ("com", "net", "org", "gov", "edu", "mil", "nom"),
    "ec": ("com", "net", "org", "gob", "edu", "mil", "fin", "med", "pro"),
    "uy": ("com", "net", "org", "gub", "edu", "mil"),
    "gt": ("com", "net", "org", "gob", "edu", "mil", "ind"),
    "do": ("com", "net", "org", "gob", "edu", "mil", "web", "art", "sld"),
    "ru": ("com", "net", "org", "msk", "spb", "int"),
    "cy": ("com", "net", "org", "gov", "ac", "biz", "ltd", "press", "pro"),
    "lb": ("com", "net", "org", "gov", "edu"),
    "kw": ("com", "net", "org", "gov", "edu", "emb", "ind"),
    "qa": ("com", "net", "org", "gov", "edu", "mil", "name", "sch"),
    "om": ("com", "net", "org", "gov", "edu", "med", "museum", "pro"),
    "rs": ("co", "in", "org", "edu", "ac", "gov"),
    "mk": ("com", "net", "org", "gov", "edu", "inf", "name"),
    "lk": ("com", "net", "org", "gov", "edu", "sch", "web", "ltd", "grp"),
    "np": ("com", "net", "org", "gov", "edu", "mil", "aero", "biz"),
    "mt": ("com", "net", "org", "gov", "edu"),
    "mz": ("co", "net", "org", "gov", "ac", "edu"),
    "tz": ("co", "ne", "or", "go", "ac", "sc", "hotel", "info", "me"),
    "ug": ("co", "ne", "or", "go", "ac", "sc", "com", "org"),
    "zm": ("co", "com", "org", "gov", "edu", "ac", "biz", "info"),
    "zw": ("co", "org", "gov", "ac", "mil"),
}

# US states register under <state>.us; Canadian provinces under
# <prov>.ca (both exact PSL rules)
_US_STATES = (
    "al ak az ar ca co ct de fl ga hi id il in ia ks ky la me md ma mi "
    "mn ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn tx ut "
    "vt va wa wv wi wy dc").split()
_CA_PROVS = "ab bc mb nb nf nl ns nt nu on pe qc sk yt".split()

SUFFIX_2: frozenset[str] = frozenset(
    {f"{lbl}.{cc}" for cc, lbls in _BY_CC.items() for lbl in lbls}
    | {f"{st}.us" for st in _US_STATES}
    | {f"{pr}.ca" for pr in _CA_PROVS})

# three-label exact rules (trimmed): Australian state school systems +
# US K-12 / community-college hierarchies under the state suffixes
_AU_STATES = "act nsw nt qld sa tas vic wa".split()
SUFFIX_3: frozenset[str] = frozenset(
    {f"{st}.edu.au" for st in _AU_STATES}
    | {f"{st}.gov.au" for st in _AU_STATES if st != "act"}
    | {f"k12.{st}.us" for st in _US_STATES}
    | {f"cc.{st}.us" for st in _US_STATES}
    | {f"lib.{st}.us" for st in _US_STATES})
