"""BibTeX relational compositions over the flattened field table —
crossref inheritance (the bibliographic join).

Scale notes: resolve is two equi-joins keyed on (url, key): one
inner join from crossref pointers to the (deduped) parent field
rows, one left-anti join to keep only fields the child doesn't
define. Both shuffle on the url key once at .bib-file granularity —
at corpus scale the field table is tiny next to page payloads, and
AQE broadcast-joins the pointer side when a file batch is small.

Semantics (bibtex's rule, deterministic subset): an entry with a
``crossref`` field inherits every field of the referenced entry
that it does not define itself; the key comparison is
case-INsensitive; the parent's own ``crossref`` (chains) is NOT
inherited (single-pass, like bibtex); duplicate parent keys resolve
to the FIRST entry in file order. DuckDB twin: the same joins in
generated SQL over the committed golden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bib_crossref_resolve(fields: DataFrame) -> DataFrame:
    """Flattened field rows (url, pos, entry_type, key, field,
    value) -> the same rows plus inherited ones (``inherited``
    flag)."""
    own = fields.select("url", "pos", "entry_type", "key", "field",
                        "value", F.lit(False).alias("inherited"))
    xref = (fields
            .where(F.col("field") == "crossref")
            .select("url", "pos", "entry_type", "key",
                    F.lower("value").alias("_target")))
    # first entry in file order wins a duplicated key
    w = Window.partitionBy("url", F.lower(F.col("key")))
    parents = (fields
               .where(F.col("key").isNotNull()
                      & F.col("field").isNotNull()
                      & (F.col("field") != "crossref"))
               .withColumn("_minpos", F.min("pos").over(w))
               .where(F.col("pos") == F.col("_minpos"))
               .select("url", F.lower("key").alias("_target"),
                       F.col("field").alias("_pfield"),
                       F.col("value").alias("_pvalue")))
    cand = (xref.join(parents, ["url", "_target"])
            .select("url", "pos", "entry_type", "key",
                    F.col("_pfield").alias("field"),
                    F.col("_pvalue").alias("value"),
                    F.lit(True).alias("inherited")))
    surviving = cand.join(
        fields.select("url", "pos", "field"),
        ["url", "pos", "field"], "left_anti")
    return own.unionByName(surviving)
