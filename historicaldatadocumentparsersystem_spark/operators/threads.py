"""Mail/forum thread reconstruction: root-finding over reply
forests by POINTER DOUBLING.

The JWZ-threading core as a distributed primitive: every message
points at its ``in_reply_to`` parent; the thread id is the root of
that forest. A naive iterate-one-hop walk needs O(max depth)
rounds; pointer doubling (each round replaces every node's known
ancestor with that ancestor's known ancestor) needs
O(log2 max depth) rounds — at 100 TB mailing-list scale the round
count, not the per-round shuffle, is the wall-clock driver, so the
doubling form is the one that scales (depth-1000 flame threads
resolve in 10 rounds).

Semantics:
- parents resolve WITHIN a partition key (``part_col``, default
  url — message-ids are only unique per archive in practice);
- a message whose parent id is missing from the archive is its own
  root (dangling reply — the archive truncated the head);
- RAISES on non-convergence after ``max_iter`` doubling rounds
  (the connected_components rule: silent partial compression would
  mislabel threads), which also bounds adversarial cycles.

Iterative-plan hygiene: the carrier is localCheckpoint-ed every
round (persist alone re-nests the lineage exponentially — see
CLAUDE.md round-4 facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def thread_roots(msgs: DataFrame, id_col: str = "message_id",
                 parent_col: str = "in_reply_to",
                 part_col: str = "url",
                 max_iter: int = 12) -> DataFrame:
    """(part, id, root_id, depth) — depth = hops to the root."""
    m = (msgs.select(F.col(part_col).alias("part"),
                     F.col(id_col).alias("id"),
                     F.col(parent_col).alias("parent"))
         .where(F.col("id").isNotNull() & (F.col("id") != ""))
         .dropDuplicates(["part", "id"]))
    ids = m.select(F.col("part").alias("ppart"),
                   F.col("id").alias("pid"))
    # resolved parent: present in the same archive, else self (root)
    state = (m.join(ids, (F.col("part") == F.col("ppart"))
                    & (F.col("parent") == F.col("pid")), "left")
             .select("part", "id",
                     F.when(F.col("pid").isNotNull()
                            & (F.col("pid") != F.col("id")),
                            F.col("pid"))
                     .otherwise(F.col("id")).alias("anc"),
                     F.when(F.col("pid").isNotNull()
                            & (F.col("pid") != F.col("id")),
                            F.lit(1))
                     .otherwise(F.lit(0)).alias("depth")))
    state = state.localCheckpoint()
    for _ in range(max_iter):
        hop = state.select(F.col("part").alias("hpart"),
                           F.col("id").alias("hid"),
                           F.col("anc").alias("hanc"),
                           F.col("depth").alias("hdepth"))
        # every anc IS some row's id (roots self-point), so the
        # doubling join is a total inner join
        nxt = (state.join(hop, (state.part == hop.hpart)
                          & (state.anc == hop.hid))
               .select(state.part.alias("part"),
                       state.id.alias("id"),
                       state.anc.alias("old_anc"),
                       F.col("hanc").alias("anc"),
                       (state.depth + F.col("hdepth"))
                       .alias("depth")))
        nxt = nxt.localCheckpoint()
        moved = nxt.where(F.col("anc") != F.col("old_anc")).count()
        state = nxt.drop("old_anc")
        if moved == 0:
            break
    else:
        raise RuntimeError(
            f"thread_roots: not converged after {max_iter} doubling "
            f"rounds (depth > 2^{max_iter} or a reply cycle); raise "
            f"max_iter for deeper archives")
    return state.select("part", "id",
                        F.col("anc").alias("root_id"), "depth")


def thread_profile(msgs: DataFrame, **kw) -> DataFrame:
    """Per-thread rollup over thread_roots: size and max depth.
    One extra (part, root) exchange."""
    roots = thread_roots(msgs, **kw)
    return (roots.groupBy("part", "root_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_messages"),
                 F.max("depth").alias("max_depth"))
            .orderBy("part", "root_id"))
