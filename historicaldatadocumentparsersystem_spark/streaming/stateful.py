"""Custom stateful streaming operator: cross-batch first-seen dedup.

Streaming form of J4 (id-preserving dedup, ``utils/RAG_methods.py:74-84``
keeps first-seen doc_ids) via ``applyInPandasWithState``: the state
store remembers every url already emitted, so re-crawled pages arriving
in later micro-batches are dropped exactly once across the stream's
lifetime (checkpointed with the query).

At 10^12 urls the state is sharded by the groupBy hash across
executors and RocksDB-backed on a real cluster
(``spark.sql.streaming.stateStore.providerClass``); the operator code
is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

DEDUP_OUT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("text", StringType(), True),
    StructField("first_batch_rows", LongType(), False),
])

_STATE_SCHEMA = StructType([StructField("emitted", LongType(), False)])


def _first_seen_fn(key, batches, state: GroupState):
    import pandas as pd
    n = 0
    first_row = None
    for b in batches:
        n += len(b)
        if first_row is None and len(b):
            first_row = b.iloc[:1]
    if state.exists:
        (emitted,) = state.get
        state.update((emitted + n,))
        return iter(())  # url already emitted in an earlier batch
    state.update((n,))
    if first_row is None:  # pragma: no cover - empty group
        return iter(())
    out = pd.DataFrame({
        "url": [key[0]],
        "text": [first_row["text"].iloc[0]],
        "first_batch_rows": [n],
    })
    return iter((out,))


def first_seen_dedup_stream(docs: DataFrame) -> DataFrame:
    """(url, text) stream -> first occurrence of each url, ever."""
    return (docs.select("url", "text")
            .groupBy("url")
            .applyInPandasWithState(
                _first_seen_fn, DEDUP_OUT_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
