"""Scale-layout sinks (SURVEY.md §1.2 storage mapping).

The reference clusters all out-edges of a vertex physically together
(KV key = partId + srcId + edgeType + rank + dstId,
``src/common/utils/NebulaKeyUtils.h:13-27``) so GetNeighbors is a prefix
scan, and assigns partitions by vid hash
(``src/clients/meta/MetaClient.cpp:1218-1230``). The Parquet translation:

- edge tables **repartitioned by src, sorted within partitions by
  (src, rank, dst)** → a traversal hop that pre-shuffles its frontier by
  the same key is a co-partitioned join, and per-file min/max stats on
  src let a vid-set probe prune whole files;
- tag tables repartitioned by vid, sorted by vid.

At 100 TB the partition count must track data size — pass
``num_partitions`` (or let AQE handle reads); the on-disk layout contract
(hash-distributed, sorted by key) is what survives the scale-up, exactly
like the reference's partId scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nebula_spark.catalog import DST, RANK, SRC, VID


def write_tag(df: DataFrame, path: str, num_partitions: int | None = None,
              mode: str = "overwrite") -> None:
    """Tag table → Parquet hash-distributed + sorted by vid."""
    out = df.repartition(num_partitions, VID) if num_partitions \
        else df.repartition(VID)
    out.sortWithinPartitions(VID).write.mode(mode).parquet(path)


def write_edges(df: DataFrame, path: str, num_partitions: int | None = None,
                mode: str = "overwrite", by_dst: bool = False) -> None:
    """Edge table → Parquet hash-distributed by src (dst when ``by_dst``,
    for reverse-traversal-heavy workloads: the analog of the reference
    storing an in-edge copy of every edge) and sorted by the full edge key
    (src, rank, dst) so parallel edges stay adjacent."""
    key = DST if by_dst else SRC
    out = df.repartition(num_partitions, key) if num_partitions \
        else df.repartition(key)
    out.sortWithinPartitions(key, RANK, DST if not by_dst else SRC) \
       .write.mode(mode).parquet(path)
