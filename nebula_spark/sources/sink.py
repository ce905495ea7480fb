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


def write_jsonl(df: DataFrame, path: str, id_col: str | None = None,
                seed: int = 42, num_partitions: int | None = None,
                mode: str = "overwrite") -> None:
    """Training-data export: JSON-lines files, optionally globally
    shuffled by the reproducible md5 key (pipeline.curate.global_shuffle).

    Spark's json writer emits one JSON object per line per part-file —
    the jsonl corpus format LLM data loaders consume. With ``id_col`` the
    rows are laid out in deterministic-shuffle order: ranged by the md5
    key across files, sorted within each file, no global single-task
    stage anywhere.
    """
    out = df
    if id_col is not None:
        from nebula_spark.pipeline.curate import global_shuffle
        out = global_shuffle(df, id_col, seed=seed,
                             num_partitions=num_partitions)
    elif num_partitions:
        out = df.repartition(num_partitions)
    out.write.mode(mode).json(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """Read a jsonl corpus; pass an explicit schema at scale (schema
    inference scans the data twice)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
