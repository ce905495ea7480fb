"""Iterative graph algorithms as Pregel-style DataFrame loops.

The reference has no PageRank (its algo executors cover paths/subgraph
only — ``src/graph/executor/algo/``); this module is the north-star
"GraphX-style iterative computation" surface: the driver loop is Python,
every superstep is a join + aggregate the optimizer plans, and state is
persisted/checkpointed per iteration so lineage stays flat.

Scale notes (100 TB):
- rank state is (vid, rank) — linear in |V|; the contribution shuffle is
  keyed on dst, identical each superstep, so with edges pre-partitioned by
  src and AQE on, each iteration is one shuffle of |E| contributions.
- out-degree is computed once, cached, and joined on src — co-partitioned
  with the edge table's layout (`sources/sink.py` hash-distributes by src).
- `localCheckpoint` per iteration cuts the growing plan; without it the
  lineage doubles per superstep and planning dominates after ~10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebula_spark.catalog import DST, SRC


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Simplified PageRank: rank' = (1-d) + d * Σ_in rank/outdeg.

    Operates on distinct (src, dst) pairs; dangling nodes keep the base
    (1-d) term (no redistribution), matching the common simplified form.
    Returns (vid, rank) after ``iterations`` synchronous supersteps.
    """
    e = edges.select(SRC, DST).distinct().persist()
    nodes = (e.select(F.col(SRC).alias("vid"))
             .union(e.select(F.col(DST).alias("vid"))).distinct().persist())
    deg = e.groupBy(SRC).agg(F.count(F.lit(1)).alias("outdeg"))
    # degree is loop-invariant: join it into the edge table ONCE — each
    # superstep then does a single rank join instead of rank+degree joins
    ew = e.join(deg, SRC).select(SRC, DST, "outdeg").persist()

    ranks = nodes.withColumn("rank", F.lit(1.0))
    try:
        for _ in range(iterations):
            # contribution sum is decimal-stabilized (the repo's float
            # discipline): double sums are shuffle-order-dependent, and a
            # rank landing on a rounding boundary flips the comparison
            contrib = (ew.join(ranks, ew[SRC] == ranks["vid"])
                       .select(F.col(DST).alias("vid"),
                               (F.col("rank") / F.col("outdeg"))
                               .cast("decimal(30,15)").alias("c")))
            sums = contrib.groupBy("vid").agg(F.sum("c").alias("s"))
            ranks = (nodes.join(sums, "vid", "left")
                     .select("vid",
                             (F.lit(1.0 - damping)
                              + F.lit(damping)
                              * F.coalesce(F.col("s").cast("double"),
                                           F.lit(0.0)))
                             .alias("rank")))
            # eager: materializes the superstep now (against the cached
            # edge/degree frames) and severs lineage — the returned frame
            # must not depend on the persisted inputs we release below
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        e.unpersist()
        nodes.unpersist()
        ew.unpersist()
