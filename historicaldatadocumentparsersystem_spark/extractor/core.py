"""Extraction dispatcher: one row of the documents table -> ExtractResult.

This is THE single-process oracle (BASELINE.json correctness gate:
byte-identical extracted text per url). The Spark pipeline's
``mapInPandas`` UDF calls :func:`extract_document` per row inside an
Arrow batch — same code path, so equality is structural, not statistical.

Reference trace re-expressed (SURVEY.md §3.1): payload sniff (S1) ->
format-specific parse (S2/S3/S8) -> element classification (F1/F2) ->
reading-order reassembly with "\\n" (A1, ``base_parser.py:42``) ->
structured record with provenance (``base_parser.py:75-81``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .cfbx import (extract_doc_text, extract_ppt_text, is_cfb, is_doc,
                   is_ppt)
from .docx import extract_docx_text, is_docx
from .epubx import extract_epub_text, is_epub
from .htmlx import decode_payload, extract_html
from .ipynbx import extract_ipynb_text, is_ipynb
from .mailx import extract_mbox_text, is_mbox
from .tarx import extract_tar_text, is_tar
from .texx import extract_latex, is_latex
from .odtx import extract_odt_text, is_odt
from .pdfx import extract_pdf
from .pptx import extract_pptx_text, is_pptx
from .rtfx import extract_rtf_text
from .sniff import (KIND_EMPTY, KIND_HTML, KIND_PDF, KIND_RTF, KIND_ZIP,
                    sniff_kind)
from .xlsxx import extract_xlsx_text, is_xlsx

KIND_PPTX = "pptx"
KIND_PPT = "ppt"
KIND_DOC = "doc"
KIND_XLSX = "xlsx"
KIND_DOCX = "docx"
KIND_EPUB = "epub"
KIND_ODT = "odt"
KIND_IPYNB = "ipynb"
KIND_MBOX = "mbox"
KIND_TAR = "tar"
KIND_LATEX = "latex"

# span struct field order used everywhere (Spark schema + oracle tuples)
SPAN_FIELDS = ("start", "end", "kind")


@dataclass
class ExtractResult:
    doc_kind: str
    extracted_text: str
    spans: list[tuple[int, int, str]] = field(default_factory=list)
    n_blocks: int = 0
    score: float = 0.0
    failed: bool = False
    title: str | None = None  # html <title> metadata (None elsewhere)

    def spans_as_dicts(self) -> list[dict]:
        return [dict(zip(SPAN_FIELDS, s)) for s in self.spans]


def extract_document(payload: bytes | None, fallback_text: str | None
                     ) -> ExtractResult:
    """Extract main content from one document payload.

    - html  : DOM parse + Arc90-style boilerplate classification
    - pdf   : PDF-subset layout pass
    - empty : fall back to the row's ``text`` column (reference F5:
      unparseable inputs return empty records, never crash —
      ``llm_support_kickoff_parser.py:28-30``); counted as a fallback
      row in lineage metrics.
    """
    kind = sniff_kind(payload)
    try:
        if kind == KIND_HTML:
            src = decode_payload(payload)  # type: ignore[arg-type]
            text, spans, score, title = extract_html(src)
            return ExtractResult(KIND_HTML, text, spans, len(spans), score,
                                 title=title)
        if kind == KIND_PDF:
            text, spans, score = extract_pdf(payload)  # type: ignore[arg-type]
            if score == 0.0 and not spans:
                # %PDF- header but no parseable page (truncated payload):
                # fallback row, counted in lineage failed_rows
                return _fallback(fallback_text, failed=True)
            return ExtractResult(KIND_PDF, text, spans, len(spans), score)
        if kind == KIND_RTF:
            # legacy-office text (extractor/rtfx.py — from-scratch
            # tokenizer; decades of .rtf sit in web archives)
            text, spans = extract_rtf_text(payload)  # type: ignore[arg-type]
            if not spans:
                return _fallback(fallback_text, failed=True)
            return ExtractResult(KIND_RTF, text, spans, len(spans), 0.0)
        if kind == KIND_ZIP:
            # S7 pptx subset (reference loaders.py:30-37 -> partition_pptx)
            if is_pptx(payload):
                text, spans = extract_pptx_text(payload)  # type: ignore[arg-type]
                if not spans:
                    return _fallback(fallback_text, failed=True)
                return ExtractResult(KIND_PPTX, text, spans, len(spans), 0.0)
            # S6 docx subset (unstructured_chunker.py:79-91, Docx2txt)
            if is_docx(payload):
                text, spans = extract_docx_text(payload)  # type: ignore[arg-type]
                if not spans:
                    return _fallback(fallback_text, failed=True)
                return ExtractResult(KIND_DOCX, text, spans, len(spans), 0.0)
            # ODF text (extractor/odtx.py — the OASIS sibling of the
            # docx subset; mimetype-gated so no overlap with OOXML)
            if is_odt(payload):
                text, spans = extract_odt_text(payload)  # type: ignore[arg-type]
                if not spans:
                    return _fallback(fallback_text, failed=True)
                return ExtractResult(KIND_ODT, text, spans, len(spans), 0.0)
            # e-book container (extractor/epubx.py, spine-ordered
            # chapters through the same DOM pipeline)
            if is_epub(payload):
                text, spans = extract_epub_text(payload)  # type: ignore[arg-type]
                if not spans:
                    return _fallback(fallback_text, failed=True)
                return ExtractResult(KIND_EPUB, text, spans, len(spans), 0.0)
            # spreadsheet workbook (extractor/xlsxx.py — the tabular
            # OOXML sibling; one span per sheet, rows tab-joined)
            if is_xlsx(payload):
                text, spans = extract_xlsx_text(payload)  # type: ignore[arg-type]
                if not spans:
                    return _fallback(fallback_text, failed=True)
                return ExtractResult(KIND_XLSX, text, spans,
                                     len(spans), 0.0)
            # non-OOXML zip: fallback, not a fail
            return _fallback(fallback_text, failed=False)
        # legacy OLE2/CFB office (extractor/cfbx.py — the reference's
        # .ppt branch, loaders.py:18-37 partition_ppt, plus Word 97;
        # magic-byte probe so it runs first among the empty-kind
        # sniffs)
        if kind == KIND_EMPTY and is_cfb(payload):
            if is_ppt(payload):
                text, spans = extract_ppt_text(payload)
                if spans:
                    return ExtractResult(KIND_PPT, text, spans,
                                         len(spans), 0.0)
                # is_ppt substring-probes the whole container, but a
                # Word .doc with an EMBEDDED PowerPoint OLE object
                # carries the marker under ObjectPool/ while only the
                # top-level streams are extractable — fall through to
                # the Word piece table before declaring failure (r6,
                # ADVICE r5)
                if not is_doc(payload):
                    return _fallback(fallback_text, failed=True)
            if is_doc(payload):
                text, spans = extract_doc_text(payload)
                if not spans:
                    return _fallback(fallback_text, failed=True)
                return ExtractResult(KIND_DOC, text, spans,
                                     len(spans), 0.0)
            # other OLE container: fallback, not a fail
            return _fallback(fallback_text, failed=False)
        # Jupyter notebook (extractor/ipynbx.py — the JSON member of
        # the loader family; sniff has no JSON kind, so the cheap
        # is_ipynb probe gates here on otherwise-empty payloads)
        if kind == KIND_EMPTY and is_ipynb(payload):
            text, spans = extract_ipynb_text(payload)
            if not spans:
                return _fallback(fallback_text, failed=True)
            return ExtractResult(KIND_IPYNB, text, spans, len(spans), 0.0)
        # mbox mail archive (extractor/mailx.py — per-message
        # subject+body blocks; html-only bodies route through the
        # same DOM pipeline)
        if kind == KIND_EMPTY and is_mbox(payload):
            text, spans = extract_mbox_text(payload)
            if not spans:
                return _fallback(fallback_text, failed=True)
            return ExtractResult(KIND_MBOX, text, spans, len(spans), 0.0)
        # tar archive (extractor/tarx.py — each regular member routes
        # back through THIS dispatcher, one level deep)
        if kind == KIND_EMPTY and is_tar(payload):
            text, spans = extract_tar_text(payload)
            if not spans:
                return _fallback(fallback_text, failed=True)
            return ExtractResult(KIND_TAR, text, spans, len(spans), 0.0)
        # raw LaTeX source (extractor/texx.py — the loosest probe,
        # so it runs last among the empty-kind sniffs)
        if kind == KIND_EMPTY and is_latex(payload):
            text, spans = extract_latex(
                payload.decode("utf-8", errors="replace"))
            if not spans:
                return _fallback(fallback_text, failed=True)
            return ExtractResult(KIND_LATEX, text, spans,
                                 len(spans), 0.0)
    except Exception:
        # degrade to fallback, mark failed (lineage failed_rows)
        return _fallback(fallback_text, failed=True)
    return _fallback(fallback_text, failed=False)


def _fallback(fallback_text: str | None, failed: bool) -> ExtractResult:
    text = fallback_text or ""
    spans = [(0, len(text), "fallback")] if text else []
    return ExtractResult(KIND_EMPTY, text, spans, len(spans), 0.0,
                         failed=failed)
