"""Unified-diff / git-patch reader — pure Python, stdlib only.

Patch files are a first-class code-corpus modality (commit data,
code-review datasets, patch-tuning pairs mine them), and they travel
through the same channels as mail (``git format-patch`` bodies in
mbox archives — the mailx family's payloads often ARE patches).
This member emits per-file and per-hunk rows so downstream SQL can
aggregate churn, filter by path, or join hunks to source spans.

Grammar subset (deterministic):
- decoding: BOM-aware UTF-8; BOM-less bytes try STRICT UTF-8 then
  latin-1 (diffs legally carry arbitrary bytes in context lines);
- a file section starts at ``diff --git <old> <new>`` (git style)
  or at a ``--- <old>`` line immediately followed by ``+++ <new>``
  (plain unified style). Inside a git section the first ---/+++
  pair REFINES the operand paths (it survives exotic paths better);
  a later ---/+++ pair starts a new plain section;
- ``a/``/``b/`` prefixes strip; ``/dev/null`` -> None (added /
  deleted side); quoted paths unquote C-style (``\\t \\n \\" \\\\``
  + octal escapes); a plain-style trailing TAB+timestamp is cut;
- git extended headers per file: ``rename from/to`` (kind
  'rename'), ``new file mode`` ('add'), ``deleted file mode``
  ('delete'), ``Binary files ... differ`` / ``GIT binary patch``
  (is_binary, zero hunks), ``similarity index N%`` (clamped 0-100);
- hunks: ``@@ -l[,s] +l[,s] @@[ section]``; omitted sizes default
  to 1 (POSIX); starts/sizes clamp to [0, 2^31) (the attribute-fed
  -allocation rule: a forged header must not overflow Int32
  columns); body lines counted by first char (``+`` added, ``-``
  removed, space/``\\`` context — ``\\ No newline...`` ignored);
  any other line ends the hunk body;
- kind precedence: add (new-file header or old=/dev/null) >
  delete > rename > modify;
- a payload with no recognizable file section yields no rows,
  never an error (F5).

Spark-free like the rest of ``extractor/`` (it IS the oracle; the
Spark source calls the same function per row). Reference anchor:
loaders.py per-format dispatch (semantic analog — this extends the
per-format family the way rtfx/texx/ipynbx do).
"""

from __future__ import annotations

import re

_HUNK_RE = re.compile(
    r"^@@ -([0-9]+)(?:,([0-9]+))? \+([0-9]+)(?:,([0-9]+))? @@"
    r"(?: (.*))?$")
_SIM_RE = re.compile(r"^similarity index ([0-9]+)%$")
_OCT_RE = re.compile(r"\\([0-7]{1,3})")

_CLAMP32 = (1 << 31) - 1


def _decode(payload: bytes) -> str:
    if payload.startswith(b"\xef\xbb\xbf"):
        payload = payload[3:]
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("latin-1")


def _unquote_path(p: str) -> str:
    """C-style unquote for git's quoted paths; plain paths verbatim."""
    p = p.strip()
    if len(p) >= 2 and p[0] == '"' and p[-1] == '"':
        p = p[1:-1]
        p = (p.replace("\\t", "\t").replace("\\n", "\n")
             .replace('\\"', '"'))
        p = _OCT_RE.sub(lambda m: chr(int(m.group(1), 8)), p)
        p = p.replace("\\\\", "\\")
    return p


def _operand(s: str) -> tuple[str, str]:
    """One ``diff --git`` operand off the front of s (quoted or up to
    the next space) -> (operand, rest)."""
    s = s.lstrip(" ")
    if s.startswith('"'):
        # scan to the closing unescaped quote
        i = 1
        while i < len(s):
            if s[i] == "\\":
                i += 2
                continue
            if s[i] == '"':
                return s[:i + 1], s[i + 1:]
            i += 1
        return s, ""
    head, _, rest = s.partition(" ")
    return head, rest


def _strip_ab(p: str) -> str | None:
    """``a/x``/``b/x`` -> ``x``; ``/dev/null`` -> None; a trailing
    TAB+timestamp (plain unified style) is cut."""
    p = _unquote_path(p.split("\t", 1)[0])
    if p == "/dev/null":
        return None
    if p[:2] in ("a/", "b/"):
        p = p[2:]
    return p or None


def _clamp(v: int) -> int:
    return v if v <= _CLAMP32 else _CLAMP32


def parse_unified_diff(payload) -> list[dict]:
    """-> one dict per file section:
    {file_idx, old_path, new_path, kind
    ('modify'|'add'|'delete'|'rename'), is_binary,
    similarity (int | None), hunks: [{hunk_idx, old_start, old_len,
    new_start, new_len, section, n_added, n_removed}]}."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = _decode(bytes(payload))
    else:
        src = payload or ""
    lines = src.split("\n")
    files: list[dict] = []
    cur: dict | None = None
    hunk: dict | None = None

    def _new_file(old, new, is_git: bool):
        nonlocal cur, hunk
        cur = {"old_path": old, "new_path": new, "is_binary": False,
               "similarity": None, "hunks": [], "_git": is_git,
               "_refined": False, "_renamed": False, "_added": False,
               "_deleted": False}
        hunk = None
        files.append(cur)

    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if line.startswith("diff --git "):
            a, rest = _operand(line[11:])
            b, _ = _operand(rest)
            _new_file(_strip_ab(a), _strip_ab(b), True)
            i += 1
            continue
        if line.startswith("--- ") and i + 1 < n \
                and lines[i + 1].startswith("+++ "):
            old = _strip_ab(line[4:])
            new = _strip_ab(lines[i + 1][4:])
            refine = (cur is not None and cur["_git"]
                      and not cur["_refined"] and not cur["hunks"]
                      and not cur["is_binary"])
            if refine:
                cur["old_path"], cur["new_path"] = old, new
                cur["_refined"] = True
                hunk = None
            else:
                _new_file(old, new, False)
            i += 2
            continue
        if cur is not None and hunk is None:
            if line.startswith("rename from "):
                cur["_renamed"] = True
                cur["old_path"] = _strip_ab(line[12:])
                i += 1
                continue
            if line.startswith("rename to "):
                cur["_renamed"] = True
                cur["new_path"] = _strip_ab(line[10:])
                i += 1
                continue
            if line.startswith("new file mode "):
                cur["_added"] = True
                i += 1
                continue
            if line.startswith("deleted file mode "):
                cur["_deleted"] = True
                i += 1
                continue
            m = _SIM_RE.match(line)
            if m:
                cur["similarity"] = min(int(m.group(1)), 100)
                i += 1
                continue
            if line.startswith("Binary files ") \
                    or line == "GIT binary patch":
                cur["is_binary"] = True
                i += 1
                continue
        m = _HUNK_RE.match(line) if cur is not None \
            and not cur["is_binary"] else None
        if m:
            hunk = {"hunk_idx": len(cur["hunks"]),
                    "old_start": _clamp(int(m.group(1))),
                    "old_len": _clamp(int(m.group(2) or 1)),
                    "new_start": _clamp(int(m.group(3))),
                    "new_len": _clamp(int(m.group(4) or 1)),
                    "section": m.group(5) or None,
                    "n_added": 0, "n_removed": 0}
            cur["hunks"].append(hunk)
            i += 1
            continue
        if hunk is not None:
            if line[:1] == "+":
                hunk["n_added"] += 1
            elif line[:1] == "-":
                hunk["n_removed"] += 1
            elif line[:1] not in (" ", "\\"):
                hunk = None      # left the hunk body
        i += 1

    out = []
    for idx, f in enumerate(files):
        if f["old_path"] is None and f["new_path"] is None:
            continue
        if f["_added"] or f["old_path"] is None:
            f["kind"] = "add"
        elif f["_deleted"] or f["new_path"] is None:
            f["kind"] = "delete"
        elif f["_renamed"]:
            f["kind"] = "rename"
        else:
            f["kind"] = "modify"
        f["file_idx"] = len(out)
        for k in ("_git", "_refined", "_renamed", "_added",
                  "_deleted"):
            del f[k]
        out.append(f)
    return out
