"""Operator library: SURVEY.md §2 inventory + training-data-pipeline ops.

Every operator is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen) wherever the semantics allow; Python
crosses the boundary only through Arrow-batched pandas UDFs
(``chunking``, the extraction core itself).
"""
