"""Row routing + schema mapping operators (F5/F6/F7/F9, U1/U2).

- F9 sentinel routing (``doc_processor.py:392-437``): elements whose
  text is a sentinel (reference: "<unknown>") are removed from the text
  stream and re-emitted as stub rows of another kind, then unioned back
  (U1 ``docling_chunker.py:65-66``).
- F6 projection+rename via a column_mapping dict
  (``models/settings.py:94-102``, ``base_parser.py:83-90``).
- F7 field defaulting to 'Not specified' (``base_parser.py:74-87``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_sentinels(df: DataFrame, is_sentinel,
                    kind_col: str = "kind",
                    normal_kind: str = "text",
                    stub_kind: str = "stub") -> DataFrame:
    """Split rows on a sentinel predicate, re-emit sentinels as stub
    rows, union back (two filters over one plan + unionByName — F9/U2).

    ``is_sentinel``: Column predicate. Non-sentinel rows keep their
    data; sentinel rows are re-kinded and their text blanked.
    """
    normal = df.where(~is_sentinel).withColumn(kind_col, F.lit(normal_kind))
    stubs = (df.where(is_sentinel)
             .withColumn(kind_col, F.lit(stub_kind))
             .withColumn("text", F.lit("")))
    return normal.unionByName(stubs)


def apply_column_mapping(df: DataFrame, mapping: dict[str, str],
                         defaults: dict[str, str] | None = None
                         ) -> DataFrame:
    """F6: rename via mapping (identity when absent); F7: coalesce
    listed columns to 'Not specified'."""
    out = df
    for old, new in mapping.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    for col in (defaults or {}):
        if col in out.columns:
            out = out.withColumn(
                col, F.coalesce(F.col(col), F.lit(defaults[col])))
    return out
