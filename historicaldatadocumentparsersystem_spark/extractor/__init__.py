"""Pure-Python extraction core (NO Spark imports allowed here).

This package is the single-process oracle required by BASELINE.json:
byte-identical extracted text per url between the Spark job and this code
is guaranteed by construction — the Spark ``mapInPandas`` UDF calls
:func:`core.extract_document` directly.
"""

from .core import ExtractResult, extract_document, SPAN_FIELDS  # noqa: F401
from .sniff import sniff_kind  # noqa: F401
