"""CSV/JSON vertex+edge import (the reference importer-config surface).

The reference loads fixtures from CSV files described by a YAML config:
per-file ``type: vertex|edge``, column-index → vid/src/dst/rank/prop
mappings, ``withHeader`` (``tests/data/nba/config.yaml``; the production
equivalent is nebula-importer's identical format). This module reads that
config shape and produces a populated ``GraphSpace``.

Spark-first: files load via ``spark.read.csv`` with an explicit schema
(never inferSchema — a schema scan of 100 TB is a full extra pass), then
column-select/cast per the mapping. Multi-tag vertex files become one
DataFrame per tag (SURVEY §1.1: a full vertex is the outer join of its
tag tables on vid).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from nebula_spark.catalog import DST, RANK, SRC, VID, GraphSpace
from nebula_spark.sources.ddl import SchemaDef, parse_ddl

try:
    import yaml
except ImportError:                                     # pragma: no cover
    yaml = None


def _raw_csv(spark: SparkSession, path: str, n_cols: int,
             with_header: bool) -> DataFrame:
    """All-string read with positional column names _c0.._cN; explicit
    schema so no inference pass runs."""
    schema = StructType([StructField(f"_c{i}", StringType(), True)
                         for i in range(n_cols)])
    return spark.read.csv(path, schema=schema, header=with_header,
                          enforceSchema=True)


def _cast(col, spark_type):
    return F.col(col).try_cast(spark_type)


def read_vertex_csv(spark: SparkSession, path: str, tag: SchemaDef,
                    vid_index: int = 0, prop_indexes: list[int] | None = None,
                    with_header: bool = True) -> DataFrame:
    """One tag's rows from a vertex CSV: vid column + typed props."""
    props = tag.schema.fields
    idxs = prop_indexes or list(range(1, 1 + len(props)))
    raw = _raw_csv(spark, path, 1 + max([vid_index] + idxs), with_header)
    cols = [F.col(f"_c{vid_index}").alias(VID)]
    cols += [_cast(f"_c{i}", f.dataType).alias(f.name)
             for i, f in zip(idxs, props)]
    # storage parity: the reference's KV layer upserts by vertex key, so a
    # vid appears once per tag no matter how many times the CSV repeats it
    return (raw.select(*cols).filter(F.col(VID).isNotNull())
            .dropDuplicates([VID]))


def read_edge_csv(spark: SparkSession, path: str, edge: SchemaDef,
                  src_index: int = 0, dst_index: int = 1,
                  rank_index: int | None = None,
                  prop_indexes: list[int] | None = None,
                  with_header: bool = True) -> DataFrame:
    """Edge rows: (src, dst, _rank, props…); missing rank column → rank 0
    (the reference's default ranking)."""
    props = edge.schema.fields
    first_prop = (rank_index + 1 if rank_index is not None
                  else max(src_index, dst_index) + 1)
    idxs = prop_indexes or list(range(first_prop, first_prop + len(props)))
    width = 1 + max([src_index, dst_index, rank_index or 0] + idxs)
    raw = _raw_csv(spark, path, width, with_header)
    cols = [F.col(f"_c{src_index}").alias(SRC),
            F.col(f"_c{dst_index}").alias(DST)]
    cols.append(_cast(f"_c{rank_index}", "long").alias(RANK)
                if rank_index is not None
                else F.lit(0).cast("long").alias(RANK))
    cols += [_cast(f"_c{i}", f.dataType).alias(f.name)
             for i, f in zip(idxs, props)]
    # storage parity: edge key (src, dst, rank) is unique in the
    # reference's KV layer — repeated CSV rows upsert, not multiply
    return (raw.select(*cols).filter(F.col(SRC).isNotNull()
                                     & F.col(DST).isNotNull())
            .dropDuplicates([SRC, DST, RANK]))


def load_space_from_config(spark: SparkSession, config_path: str,
                           name: str | None = None) -> GraphSpace:
    """Build a GraphSpace from a reference-format importer YAML
    (space + schema DDL + per-file mappings)."""
    if yaml is None:
        raise ImportError("pyyaml not available for config parsing")
    with open(config_path) as fh:
        cfg = yaml.safe_load(fh)
    base = os.path.dirname(os.path.abspath(config_path))
    schemas, _indexes = parse_ddl(cfg["schema"])
    by_name = {(s.kind, s.name): s for s in schemas}

    space = GraphSpace(spark, name or cfg.get("space", {}).get("name", "csv"))
    parts: dict[tuple[str, str], list[DataFrame]] = {}

    for f in cfg.get("files", []):
        path = os.path.join(base, f["path"])
        header = bool(f.get("withHeader", False))
        if f["type"] == "vertex":
            v = f["vertex"]
            for tag_map in v.get("tags", []):
                sd = by_name[("tag", tag_map["name"])]
                idxs = [p["index"] for p in tag_map.get("props", [])] or None
                df = read_vertex_csv(spark, path, sd,
                                     vid_index=v["vid"]["index"],
                                     prop_indexes=idxs, with_header=header)
                parts.setdefault(("tag", sd.name), []).append(df)
        else:
            e = f["edge"]
            sd = by_name[("edge", e["name"])]
            idxs = [p["index"] for p in e.get("props", [])] or None
            rank = e.get("rank", {}).get("index")
            df = read_edge_csv(spark, path, sd,
                               src_index=e["srcVID"]["index"],
                               dst_index=e["dstVID"]["index"],
                               rank_index=rank, prop_indexes=idxs,
                               with_header=header)
            parts.setdefault(("edge", sd.name), []).append(df)

    for (kind, nm), dfs in parts.items():
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        sd = by_name[(kind, nm)]
        if kind == "tag":
            space.create_tag(nm, df=out, ttl_col=sd.ttl_col,
                             ttl_duration=sd.ttl_duration)
        else:
            space.create_edge(nm, df=out, ttl_col=sd.ttl_col,
                              ttl_duration=sd.ttl_duration)
    return space
