"""Jupyter notebook (.ipynb) subset reader — pure Python, stdlib json.

Notebooks are a first-class training-data source (code corpora ship
millions of them; The Stack treats .ipynb as its own format) and a
crawl-scale pipeline meets them as raw JSON payloads.  The reference
dispatches office formats by extension (``main.py:91-97``) and never
met notebooks; this is the JSON member of the per-format loader
family (docx/pptx/odt/epub/rtf siblings).

Format shape (nbformat spec):

- v4: top-level ``cells`` list; each cell has ``cell_type``
  (``markdown`` | ``code`` | ``raw``) and ``source`` as EITHER a
  string or a list of line strings (both legal serializations — the
  joined text is identical).  Code cells add ``execution_count``
  (nullable) and ``outputs``: ``stream`` (``text``),
  ``execute_result`` / ``display_data`` (``data["text/plain"]``),
  ``error`` (``ename``/``evalue``).
- v3: cells live under ``worksheets[*].cells``; code cells use
  ``input`` / ``prompt_number`` / per-cell ``language``; outputs use
  ``pyout`` / ``pyerr`` / ``stream`` with a ``text`` field.
- notebook language: v4 ``metadata.kernelspec.language``, falling
  back to ``metadata.language_info.name``; v3 per-code-cell
  ``language``, then the same metadata fallbacks.

Spark-free like the rest of ``extractor/`` (it IS the oracle; the
Spark source calls the same function per row).  ``make_ipynb`` is the
encode half for fixtures and must itself decode (the exifx
fixture-writer rule).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

KIND_IPYNB = "ipynb"

CELL_MARKDOWN = "markdown"
CELL_CODE = "code"
CELL_RAW = "raw"


@dataclass
class NbCell:
    idx: int                 # 0-based cell index in document order
    cell_type: str           # markdown | code | raw
    lang: str                # notebook/cell language ('' if undeclared)
    source: str              # joined cell source
    exec_count: int | None   # code cells only (None when never run)
    n_outputs: int           # code cells only (0 elsewhere)
    output_text: str         # joined textual outputs ('' if none)


def is_ipynb(payload: bytes | None) -> bool:
    """Cheap probe: JSON-object prefix plus the two keys every
    notebook serialization carries.  The real parse (and its failure
    handling) happens in :func:`parse_notebook`."""
    if not payload:
        return False
    head = payload[:64].lstrip(b" \t\r\n\x0c")
    if not head.startswith(b"{"):
        return False
    if b'"nbformat"' not in payload:
        return False
    return b'"cells"' in payload or b'"worksheets"' in payload


def _join(src) -> str:
    if isinstance(src, str):
        return src
    if isinstance(src, list):
        return "".join(s for s in src if isinstance(s, str))
    return ""


def _output_text_v4(out: dict) -> str:
    t = out.get("output_type")
    if t == "stream":
        return _join(out.get("text"))
    if t in ("execute_result", "display_data"):
        data = out.get("data")
        if isinstance(data, dict):
            return _join(data.get("text/plain"))
        return ""
    if t == "error":
        name = out.get("ename") or ""
        val = out.get("evalue") or ""
        return f"{name}: {val}" if (name or val) else ""
    return ""


def _output_text_v3(out: dict) -> str:
    t = out.get("output_type")
    if t == "pyerr":
        name = out.get("ename") or ""
        val = out.get("evalue") or ""
        return f"{name}: {val}" if (name or val) else ""
    return _join(out.get("text"))


def _nb_lang(nb: dict) -> str:
    meta = nb.get("metadata")
    if not isinstance(meta, dict):
        return ""
    ks = meta.get("kernelspec")
    if isinstance(ks, dict) and isinstance(ks.get("language"), str):
        return ks["language"]
    li = meta.get("language_info")
    if isinstance(li, dict) and isinstance(li.get("name"), str):
        return li["name"]
    return ""


def parse_notebook(payload: bytes | None) -> list[NbCell]:
    """All cells in document order; [] for anything that is not a
    parseable notebook (F5 semantics: skip, never crash)."""
    if not is_ipynb(payload):
        return []
    try:
        nb = json.loads(payload.decode("utf-8", errors="replace"))
    except Exception:
        return []
    if not isinstance(nb, dict):
        return []
    v3 = nb.get("nbformat") == 3
    if v3:
        cells = []
        for ws in nb.get("worksheets") or []:
            if isinstance(ws, dict):
                cells.extend(c for c in ws.get("cells") or []
                             if isinstance(c, dict))
    else:
        cells = [c for c in nb.get("cells") or [] if isinstance(c, dict)]
    nb_lang = _nb_lang(nb)
    out: list[NbCell] = []
    for idx, cell in enumerate(cells):
        ctype = cell.get("cell_type")
        if ctype not in (CELL_MARKDOWN, CELL_CODE, CELL_RAW):
            continue
        if ctype == CELL_CODE:
            src = _join(cell.get("input") if v3 else cell.get("source"))
            ec = cell.get("prompt_number") if v3 \
                else cell.get("execution_count")
            if not isinstance(ec, int):
                ec = None
            outputs = [o for o in cell.get("outputs") or []
                       if isinstance(o, dict)]
            texts = [(_output_text_v3(o) if v3 else _output_text_v4(o))
                     for o in outputs]
            otext = "\n".join(t for t in texts if t)
            lang = cell.get("language") if v3 else None
            if not isinstance(lang, str) or not lang:
                lang = nb_lang
            out.append(NbCell(idx, ctype, lang, src, ec,
                              len(outputs), otext))
        else:
            out.append(NbCell(idx, ctype, nb_lang,
                              _join(cell.get("source")), None, 0, ""))
    return out


def extract_ipynb_text(payload: bytes | None
                       ) -> tuple[str, list[tuple[int, int, str]]]:
    """Core-dispatch form: authored cell sources (markdown, code and
    raw — outputs are derived, not authored, so they stay out of the
    main text) reassembled in reading order with "\\n", one span per
    non-empty cell labeled by cell type (the A1 convention every
    format member follows)."""
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for cell in parse_notebook(payload):
        txt = cell.source.strip()
        if not txt:
            continue
        if parts:
            pos += 1  # the "\n" joiner
        spans.append((pos, pos + len(txt), cell.cell_type))
        parts.append(txt)
        pos += len(txt)
    return "\n".join(parts), spans


# --- encode half (fixtures) ---------------------------------------------------

def make_ipynb(cells: list[dict], lang: str = "python",
               nbformat: int = 4, kernelspec: bool = True) -> bytes:
    """Serialize a minimal-but-real notebook.  ``cells`` entries:
    ``{"cell_type", "source" (str|list), "execution_count"?,
    "outputs"?: list, "language"?}``.  v4 puts ``kernelspec`` (or
    ``language_info`` when ``kernelspec=False``) in metadata; v3 wraps
    cells in one worksheet and moves code source to ``input`` /
    ``prompt_number``."""
    if nbformat == 3:
        v3cells = []
        for c in cells:
            cc = dict(c)
            if cc.get("cell_type") == CELL_CODE:
                cc["input"] = cc.pop("source", "")
                cc["prompt_number"] = cc.pop("execution_count", None)
                cc.setdefault("outputs", [])
            v3cells.append(cc)
        nb = {"metadata": {"name": "fixture"}, "nbformat": 3,
              "nbformat_minor": 0,
              "worksheets": [{"cells": v3cells}]}
    else:
        v4cells = []
        for c in cells:
            cc = dict(c)
            cc.pop("language", None)
            if cc.get("cell_type") == CELL_CODE:
                cc.setdefault("execution_count", None)
                cc.setdefault("outputs", [])
            cc.setdefault("metadata", {})
            v4cells.append(cc)
        meta = ({"kernelspec": {"name": lang, "language": lang,
                                "display_name": lang.title()}}
                if kernelspec else
                {"language_info": {"name": lang}})
        nb = {"cells": v4cells, "metadata": meta,
              "nbformat": 4, "nbformat_minor": 5}
    return json.dumps(nb, ensure_ascii=False,
                      separators=(",", ": ")).encode("utf-8")
