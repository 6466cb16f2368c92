"""CSV/DSV source parsing (RFC 4180 + delimiter sniffing) — pure
Python, stdlib only (no csv module: the grammar is the contract,
golden-pinned like the other per-format loaders).

Closes SURVEY §2 S5 (the reference's CSVLoader path). Web corpora
carry data as CSV/TSV/semicolon-DSV exports; a loader needs to
sniff the dialect before it can emit records.

Deterministic subset:
- dialect sniff over the first ``SNIFF_LINES`` parsed rows (quote-
  aware): for each candidate in ``DELIMS`` (order = tiebreak), take
  the MODAL field count (ties to the larger count); the candidate
  scores (modal coverage, modal count) when the mode is >= 2 and
  covers at least half the sniffed rows, else nothing; the highest
  score wins, comma when nothing scores — ragged files sniff by
  their dominant width;
- grammar: fields split on the delimiter at quote depth 0; a field
  starting with ``"`` (after optional WSP) is quoted — ``""``
  inside is a literal quote, delimiters/newlines inside are data;
  text between a closing quote and the next delimiter is appended
  verbatim (Excel's lenient rule); an unterminated quote runs to
  EOF (one final field);
- row ends: CRLF, LF, or CR at quote depth 0; a trailing newline
  does not emit an empty row; fully-empty physical rows are
  SKIPPED;
- header: the first parsed row is a header iff all its cells are
  non-empty, none matches ``NUM_RE``, and the cells are distinct
  after lowercasing; data rows then get 0-based ``row`` indexes and
  cells carry the header name (NULL when the row is wider than the
  header or there is no header).
"""

from __future__ import annotations

import re

DELIMS = (",", ";", "\t", "|")
SNIFF_LINES = 10
NUM_RE = r"^-?[0-9]+(\.[0-9]+)?$"

_NUM = re.compile(NUM_RE)


def _parse_rows(text: str, delim: str) -> list[list[str]]:
    """Quote-aware row/field split of the whole document."""
    rows: list[list[str]] = []
    field: list[str] = []
    row: list[str] = []
    i, n = 0, len(text)
    in_quotes = False
    field_started = False

    def end_field():
        nonlocal field, field_started
        row.append("".join(field))
        field = []
        field_started = False

    def end_row():
        nonlocal row
        end_field()
        if not (len(row) == 1 and row[0] == ""):
            rows.append(row)
        row = []

    while i < n:
        c = text[i]
        if in_quotes:
            if c == '"':
                if i + 1 < n and text[i + 1] == '"':
                    field.append('"')
                    i += 2
                    continue
                in_quotes = False
                i += 1
                continue
            field.append(c)
            i += 1
            continue
        if c == '"' and not field_started:
            in_quotes = True
            field_started = True
            i += 1
            continue
        if c == delim:
            end_field()
            i += 1
            continue
        if c == "\r":
            end_row()
            i += 2 if i + 1 < n and text[i + 1] == "\n" else 1
            continue
        if c == "\n":
            end_row()
            i += 1
            continue
        field.append(c)
        field_started = True
        i += 1
    if field or field_started or row:
        end_row()
    return rows


def sniff_delimiter(text: str) -> str:
    """Pick the candidate with the best (modal coverage, modal
    count) over the sniffed rows — mode >= 2 and covering at least
    half the rows; candidate order breaks ties; comma when nothing
    scores."""
    from collections import Counter
    best, best_key = DELIMS[0], (0, 0)
    for d in DELIMS:
        counts = [len(r) for r in _parse_rows(text, d)[:SNIFF_LINES]]
        if not counts:
            continue
        val, freq = max(Counter(counts).items(),
                        key=lambda kv: (kv[1], kv[0]))
        if val >= 2 and freq * 2 >= len(counts):
            key = (freq, val)
            if key > best_key:
                best, best_key = d, key
    return best


def detect_header(first_row: list[str]) -> bool:
    cells = [c.strip() for c in first_row]
    if not cells or any(c == "" for c in cells):
        return False
    if any(_NUM.match(c) for c in cells):
        return False
    low = [c.lower() for c in cells]
    return len(set(low)) == len(low)


def extract_csv(payload) -> dict:
    """CSV payload (bytes/str) -> {delimiter, has_header, header:
    [names]|None, records: [(row, col, header|None, value)]}."""
    from .bibx import _decode
    text = _decode(payload) if isinstance(payload, (bytes,
                                                    bytearray)) \
        else (payload or "")
    delim = sniff_delimiter(text)
    rows = _parse_rows(text, delim)
    has_header = bool(rows) and detect_header(rows[0])
    header = [c.strip() for c in rows[0]] if has_header else None
    data = rows[1:] if has_header else rows
    records: list[tuple] = []
    for ri, row in enumerate(data):
        for ci, value in enumerate(row):
            name = (header[ci] if header and ci < len(header)
                    else None)
            records.append((ri, ci, name, value))
    return {"delimiter": delim, "has_header": has_header,
            "header": header, "records": records}
