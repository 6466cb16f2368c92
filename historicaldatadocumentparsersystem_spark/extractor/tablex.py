"""HTML table extraction to structured cells (Spark-free, pure Python).

Tables are the structured-data payload of the web — product specs,
rankings, statistics — and a training pipeline wants them as ROWS, not
as flattened prose (the extractor's reading-order pass deliberately
treats dense tables as boilerplate candidates). The reference's
document loaders surface per-element structure (its partitioners
yield Table elements); this is the corpus-level pass producing one
row per cell so downstream SQL can pivot/filter.

Built on the fast scanner's full-attribute mode like linkx/metax (the tree
builder already auto-closes the tr/td/th soup of real-world markup).
This module is the correctness oracle: the Spark operator
(``operators/pagemeta.py:extract_tables_df``) calls these functions
from a mapInPandas batch, so golden-parquet parity is structural.

Determinism contract:
- tables number in DOCUMENT ORDER (including tables nested inside a
  cell — the nested table gets its own table_idx, and its text is
  EXCLUDED from the parent cell's text);
- row_idx counts <tr> in order across thead/tbody/tfoot alike;
  col_idx is the cell's position among its row's cells (no
  colspan/rowspan expansion — documented simplification; the span
  attributes ride along as integers for downstream expansion);
- is_header is True for <th> cells;
- cell text is a raw source slice, whitespace-normalized, entities
  preserved (the linkx anchor-text contract);
- malformed pages degrade to fewer cells, never raise (F5).
"""
from __future__ import annotations

from .htmlx import (_Node, decode_payload, iter_elements,
                    parse_dom, subtree_text)

_CELL_TAGS = ("td", "th")


def _int_attr(node: _Node, name: str) -> int:
    """colspan/rowspan as a positive int, defaulting to 1 (browser
    behavior for absent/garbage values)."""
    raw = (node.attrs.get(name) or "").strip()
    if raw.isdigit():
        v = int(raw)
        if 0 < v < 10000:
            return v
    return 1


def _cell_text(cell: _Node, src: str) -> str:
    """Text of a cell subtree, stopping at nested <table> boundaries."""
    return subtree_text(cell, src, stop_tags=("table",))


def _iter_tables(root: _Node):
    """Every <table> node in document order (nested ones included)."""
    for el, _depth in iter_elements(root):
        if el.tag == "table":
            yield el


def _table_cells(table: _Node, src: str):
    """(row_idx, col_idx, is_header, colspan, rowspan, text) for one
    table, skipping rows/cells of nested tables (their own tables) AND
    anything wrapped inside a cell (a stray <tr> under <td><div> stays
    cell text — descending into cells here would double-extract it as
    both a row and part of its parent cell's text)."""
    rows = [el for el, _depth in iter_elements(
                table,
                descend=lambda e: e.tag not in ("table", "td", "th"))
            if el.tag == "tr"]
    out = []
    for row_idx, tr in enumerate(rows):
        col_idx = 0
        for cell in tr.children:
            if not isinstance(cell, _Node) or cell.tag not in _CELL_TAGS:
                continue
            out.append((row_idx, col_idx, cell.tag == "th",
                        _int_attr(cell, "colspan"),
                        _int_attr(cell, "rowspan"),
                        _cell_text(cell, src)))
            col_idx += 1
    return out


def extract_tables(payload) -> list[tuple]:
    """(table_idx, row_idx, col_idx, is_header, colspan, rowspan, text)
    for every cell of every <table> in the document."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return tables_from_root(parse_dom(src, full_attrs=True), src)


def tables_from_root(root, src: str) -> list[tuple]:
    """extract_tables over an already-parsed tree."""
    out: list[tuple] = []
    for table_idx, table in enumerate(_iter_tables(root)):
        for cell in _table_cells(table, src):
            out.append((table_idx, *cell))
    return out
