"""TOML config reader — pure Python, from scratch over the TOML 1.0
grammar, Spark-free, pinned value-for-value against stdlib
``tomllib`` (the idnx-vs-stdlib-codec pattern: a spec codec with a
free independent oracle in the standard library).

Crawled repos are full of pyproject.toml / Cargo.toml /
netlify.toml; the engine's view is a FLATTENED key index — one row
per leaf value with the dotted path (array elements as ``k[i]``),
a type label, and a canonical text rendering — the shape a
dependency-mining pipeline joins on.

Grammar surface: bare/quoted/dotted keys; basic and literal
strings (escapes incl. \\uXXXX/\\UXXXXXXXX); integers (dec with
underscores, 0x/0o/0b); floats (exponents, inf/nan); booleans;
RFC 3339 datetimes/dates/times (kept as text); arrays (nested,
heterogeneous); inline tables; ``[table]`` and ``[[array-of-
table]]`` headers; comments. Multiline strings are the one
documented gap (parse_toml reports ok=False on them rather than
guessing). Duplicate-key and redefinition rules follow the spec —
an invalid document yields ok=False and no rows, matching
tomllib's all-or-nothing contract.
"""

from __future__ import annotations

import datetime as _dt
import re

_BARE = re.compile(r"[A-Za-z0-9_-]+")
_DATETIME = re.compile(
    r"\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?"
    r"([Zz]|[+-]\d{2}:\d{2})?|\d{4}-\d{2}-\d{2}"
    r"|\d{2}:\d{2}:\d{2}(\.\d+)?")
_NUM_START = re.compile(r"[+-]?(\d|inf|nan)")
# underscores must be SURROUNDED by digits (TOML 1.0); leading /
# trailing / doubled underscores fall out of the match and the
# line-end check rejects the leftover
_RADIX = re.compile(r"[0-9A-Fa-f]+(?:_[0-9A-Fa-f]+)*")
_DECNUM = re.compile(
    r"\d+(?:_\d+)*(?:\.\d+(?:_\d+)*)?(?:[eE][+-]?\d+(?:_\d+)*)?")
_INTPART = re.compile(r"\d+")
_ESC = {'"': '"', "\\": "\\", "b": "\b", "t": "\t", "n": "\n",
        "f": "\f", "r": "\r"}


class _Err(ValueError):
    pass


class _P:
    def __init__(self, src: str):
        self.s = src
        self.i = 0

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def ws(self, newlines: bool = False) -> None:
        while not self.eof():
            c = self.s[self.i]
            if c in " \t" or (newlines and c in "\r\n"):
                self.i += 1
            elif c == "#":
                nl = self.s.find("\n", self.i)
                self.i = len(self.s) if nl < 0 else nl
            else:
                return

    def expect(self, c: str) -> None:
        if self.s[self.i:self.i + len(c)] != c:
            raise _Err(f"expected {c!r} at {self.i}")
        self.i += len(c)

    def line_end(self) -> None:
        self.ws()
        if self.eof():
            return
        if self.peek() == "\r":
            self.i += 1
        if self.peek() != "\n":
            raise _Err(f"junk at {self.i}")
        self.i += 1

    # --- keys ---------------------------------------------------
    def key(self) -> list[str]:
        parts = [self._checked_key(self._simple_key())]
        while True:
            save = self.i
            self.ws()
            if self.peek() == ".":
                self.i += 1
                self.ws()
                parts.append(
                    self._checked_key(self._simple_key()))
            else:
                self.i = save
                return parts

    def _simple_key(self) -> str:
        c = self.peek()
        if c == '"':
            return self._basic_string()
        if c == "'":
            return self._literal_string()
        m = _BARE.match(self.s, self.i)
        if not m:
            raise _Err(f"bad key at {self.i}")
        self.i = m.end()
        return m.group()

    def _checked_key(self, k: str) -> str:
        if "\x00" in k:  # would collide with the kind mark
            raise _Err("NUL in key")
        return k

    # --- strings ------------------------------------------------
    def _basic_string(self) -> str:
        if self.s[self.i:self.i + 3] == '"""':
            raise _Err("multiline string (documented gap)")
        self.expect('"')
        out = []
        while True:
            if self.eof():
                raise _Err("unterminated string")
            c = self.s[self.i]
            self.i += 1
            if c == '"':
                return "".join(out)
            if c in "\n\r":
                raise _Err("newline in string")
            if c == "\\":
                e = self.s[self.i]
                self.i += 1
                if e in _ESC:
                    out.append(_ESC[e])
                elif e == "u":
                    out.append(chr(int(self.s[self.i:self.i + 4],
                                       16)))
                    self.i += 4
                elif e == "U":
                    out.append(chr(int(self.s[self.i:self.i + 8],
                                       16)))
                    self.i += 8
                else:
                    raise _Err(f"bad escape \\{e}")
            else:
                out.append(c)

    def _literal_string(self) -> str:
        if self.s[self.i:self.i + 3] == "'''":
            raise _Err("multiline string (documented gap)")
        self.expect("'")
        end = self.s.find("'", self.i)
        if end < 0 or "\n" in self.s[self.i:end]:
            raise _Err("unterminated literal")
        out = self.s[self.i:end]
        self.i = end + 1
        return out

    # --- values -------------------------------------------------
    def value(self):
        c = self.peek()
        if c == '"':
            return self._basic_string()
        if c == "'":
            return self._literal_string()
        if c == "[":
            return self._array()
        if c == "{":
            return self._inline_table()
        if self.s.startswith("true", self.i):
            self.i += 4
            return True
        if self.s.startswith("false", self.i):
            self.i += 5
            return False
        m = _DATETIME.match(self.s, self.i)
        if m:
            return self._temporal(m.group())
        if _NUM_START.match(self.s, self.i):
            return self._number()
        raise _Err(f"bad value at {self.i}")

    def _temporal(self, text: str):
        self.i += len(text)
        try:
            if re.fullmatch(r"\d{2}:\d{2}:\d{2}(\.\d+)?", text):
                return _dt.time.fromisoformat(text)
            if re.fullmatch(r"\d{4}-\d{2}-\d{2}", text):
                return _dt.date.fromisoformat(text)
            return _dt.datetime.fromisoformat(
                text.replace("t", "T").replace("z", "Z")
                .replace(" ", "T"))
        except ValueError as e:
            raise _Err(str(e))

    def _number(self):
        s = self.s
        j = self.i
        sign = 1
        if s[j] in "+-":
            sign = -1 if s[j] == "-" else 1
            j += 1
        if s.startswith("inf", j):
            self.i = j + 3
            return sign * float("inf")
        if s.startswith("nan", j):
            self.i = j + 3
            return float("nan")
        if s.startswith(("0x", "0o", "0b"), j):
            base = {"x": 16, "o": 8, "b": 2}[s[j + 1]]
            m = _RADIX.match(s, j + 2)
            if not m or s[self.i] in "+-":
                raise _Err("bad radix int")
            self.i = m.end()
            return int(m.group().replace("_", ""), base)
        m = _DECNUM.match(s, j)
        if not m:
            raise _Err("bad number")
        raw = m.group().replace("_", "")
        self.i = m.end()
        # leading-zero rule applies to the INTEGER PART of floats
        # too (01.5 is invalid; 0.5 and 1e01 are fine)
        intpart = _INTPART.match(raw).group()
        if len(intpart) > 1 and intpart[0] == "0":
            raise _Err("leading zero")
        if "." in raw or "e" in raw or "E" in raw:
            return sign * float(raw)
        return sign * int(raw)

    def _array(self) -> list:
        self.expect("[")
        out = []
        while True:
            self.ws(newlines=True)
            if self.peek() == "]":
                self.i += 1
                return out
            out.append(self.value())
            self.ws(newlines=True)
            if self.peek() == ",":
                self.i += 1
            elif self.peek() != "]":
                raise _Err("bad array sep")

    def _inline_table(self) -> dict:
        self.expect("{")
        # inline tables are frozen wherever they land, including
        # top-level assignments — mark here, not at the call site
        out: dict = {_KIND: "inline"}
        self.ws()
        if self.peek() == "}":
            self.i += 1
            return out
        while True:
            self.ws()
            path = self.key()
            self.ws()
            self.expect("=")
            self.ws()
            _assign(out, path, self.value(), inline=True)
            self.ws()
            if self.peek() == ",":
                self.i += 1
                continue
            self.expect("}")
            return out


# table-creation kinds (the "\x00kind" mark, stripped on output):
# 'header' = declared by [x]; 'implicit' = intermediate of a
# deeper header (re-openable); 'dotted' = created/extended by a
# dotted key (a later header on it is a redefinition); 'inline' =
# frozen. These are tomllib's declaration rules, probe-verified.
_KIND = "\x00kind"


def _assign(root: dict, path: list[str], val, inline=False) -> None:
    cur = root
    for p in path[:-1]:
        nxt = cur.get(p)
        if nxt is None:
            nxt = cur[p] = {_KIND: "dotted"}
        if not isinstance(nxt, dict) or \
                nxt.get(_KIND) in ("inline", "header"):
            raise _Err(f"conflict at {p}")
        # dotted traversal claims implicit nodes for dotted rules
        if nxt.get(_KIND) == "implicit":
            nxt[_KIND] = "dotted"
        cur = nxt
    if path[-1] in cur:
        raise _Err(f"duplicate {path[-1]}")
    if inline and isinstance(val, dict):
        val[_KIND] = "inline"
    cur[path[-1]] = val


def _parse_doc(src: str) -> dict:
    p = _P(src)
    root: dict = {}
    cur = root
    while True:
        p.ws(newlines=True)
        if p.eof():
            break
        if p.peek() == "[":
            is_aot = p.s.startswith("[[", p.i)
            p.i += 2 if is_aot else 1
            p.ws()
            path = p.key()
            p.ws()
            p.expect("]]" if is_aot else "]")
            p.line_end()
            cur = root
            for q in path[:-1]:
                nxt = cur.get(q)
                if nxt is None:
                    nxt = cur[q] = {_KIND: "implicit"}
                if isinstance(nxt, list):
                    nxt = nxt[-1]
                if not isinstance(nxt, dict) or \
                        nxt.get(_KIND) == "inline":
                    raise _Err(f"conflict at {q}")
                cur = nxt
            leaf = path[-1]
            if is_aot:
                arr = cur.setdefault(leaf, [])
                if not isinstance(arr, list):
                    raise _Err(f"conflict at {leaf}")
                arr.append({_KIND: "header"})
                cur = arr[-1]
            else:
                nxt = cur.get(leaf)
                if nxt is None:
                    fresh: dict = {_KIND: "header"}
                    cur[leaf] = fresh
                    cur = fresh
                elif isinstance(nxt, dict) and \
                        nxt.get(_KIND) == "implicit":
                    nxt[_KIND] = "header"  # promote once
                    cur = nxt
                else:
                    # header / dotted / inline / aot / scalar:
                    # all are redefinitions
                    raise _Err(f"table redefined {path}")
            continue
        path = p.key()
        p.ws()
        p.expect("=")
        p.ws()
        val = p.value()
        p.line_end()
        _assign(cur, path, val)
    return root


def _strip_marks(obj):
    if isinstance(obj, dict):
        return {k: _strip_marks(v) for k, v in obj.items()
                if k != _KIND}
    if isinstance(obj, list):
        return [_strip_marks(v) for v in obj]
    return obj


def parse_toml(src) -> dict:
    """src (str or utf-8 bytes) -> {"ok": bool, "doc": dict|None};
    never raises. ok False on any grammar violation (tomllib's
    all-or-nothing contract)."""
    if isinstance(src, (bytes, bytearray)):
        try:
            src = bytes(src).decode("utf-8")
        except UnicodeDecodeError:
            return {"ok": False, "doc": None}
    if not isinstance(src, str):
        return {"ok": False, "doc": None}
    try:
        return {"ok": True, "doc": _strip_marks(_parse_doc(src))}
    except (ValueError, IndexError, KeyError, RecursionError):
        return {"ok": False, "doc": None}


def flatten(doc: dict) -> list[tuple]:
    """parsed doc -> [(pos, key_path, vtype, value_text)] — the
    shared flattener used for BOTH our parser and the tomllib pin
    (so the parity test compares apples to apples)."""
    rows: list[tuple] = []

    def vt(v) -> str:
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, _dt.datetime):
            return "datetime"
        if isinstance(v, _dt.date):
            return "date"
        if isinstance(v, _dt.time):
            return "time"
        return "string"

    def render(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
            return v.isoformat()
        return str(v)

    def walk(obj, path: str) -> None:
        if isinstance(obj, dict):
            if not obj and path:
                rows.append((len(rows), path, "table", ""))
            for k, v in obj.items():
                kk = k if _BARE.fullmatch(k) else f'"{k}"'
                walk(v, f"{path}.{kk}" if path else kk)
        elif isinstance(obj, list):
            if not obj:
                rows.append((len(rows), path, "array", ""))
            for i, v in enumerate(obj):
                walk(v, f"{path}[{i}]")
        else:
            rows.append((len(rows), path, vt(obj), render(obj)))

    walk(doc, "")
    return rows
