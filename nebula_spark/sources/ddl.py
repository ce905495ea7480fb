"""Schema DDL parser: ``CREATE TAG / CREATE EDGE`` statements → typed
definitions.

The reference declares fixture schemas as nGQL DDL inside importer configs
(``tests/data/nba/config.yaml`` `schema:` block; grammar
``src/parser/parser.yy`` create_tag_sentence / create_edge_sentence;
property types ``src/interface/common.thrift:268-299``). This module
parses that surface into Spark ``StructType``s so a reference user's
schema files load unchanged. Index DDL is accepted and recorded but
carries no runtime behavior (Parquet stats + Catalyst pushdown subsume
secondary indexes — SURVEY.md §2.1 IndexScan row).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BooleanType, DataType, DateType, DoubleType, FloatType, IntegerType,
    LongType, StringType, StructField, StructType, TimestampNTZType,
)

_TYPE_MAP: dict[str, DataType] = {
    "bool": BooleanType(),
    "int8": IntegerType(), "int16": IntegerType(), "int32": IntegerType(),
    "int": LongType(), "int64": LongType(),
    "float": FloatType(), "double": DoubleType(),
    "string": StringType(),
    "timestamp": LongType(),            # reference Timestamp = int64 epoch
    "date": DateType(),
    "datetime": TimestampNTZType(),
    "time": StringType(),               # no Spark TIME type (SURVEY §1.1)
    "geography": StringType(),          # WKT (functions/geo.py)
    "duration": StringType(),
}

_CREATE = re.compile(
    r"create\s+(tag|edge)\s+(?:if\s+not\s+exists\s+)?(\w+)\s*\(([^)]*)\)"
    r"(?:\s+ttl_duration\s*=\s*(\d+)\s*,\s*ttl_col\s*=\s*\"?(\w*)\"?)?",
    re.IGNORECASE | re.DOTALL)
_INDEX = re.compile(
    r"create\s+(tag|edge)\s+index\s+(?:if\s+not\s+exists\s+)?(\w+)\s+on\s+"
    r"(\w+)\s*\(([^)]*)\)", re.IGNORECASE)
_COL = re.compile(
    r"(\w+)\s+(\w+)(?:\s*\(\s*\d+\s*\))?"          # name type [(len)]
    r"(\s+not\s+null)?(?:\s+default\s+(\S+))?", re.IGNORECASE)


@dataclass
class SchemaDef:
    kind: str                    # tag | edge
    name: str
    schema: StructType
    defaults: dict = field(default_factory=dict)
    ttl_col: str | None = None
    ttl_duration: int = 0


@dataclass
class IndexDef:
    kind: str
    name: str
    on: str
    cols: list[str]


def _parse_cols(body: str) -> tuple[StructType, dict]:
    fields, defaults = [], {}
    for part in filter(None, (p.strip() for p in body.split(","))):
        m = _COL.match(part)
        if not m:
            raise ValueError(f"bad column def: {part!r}")
        name, typ, notnull, default = m.groups()
        if typ.lower() == "fixed_string":
            typ = "string"
        dt = _TYPE_MAP.get(typ.lower())
        if dt is None:
            raise ValueError(f"unknown type {typ!r} in {part!r}")
        fields.append(StructField(name, dt, nullable=notnull is None))
        if default is not None:
            defaults[name] = default.strip("\"'")
    return StructType(fields), defaults


def parse_ddl(ddl: str) -> tuple[list[SchemaDef], list[IndexDef]]:
    """Parse a `schema:` block (semicolon-separated CREATE statements)."""
    schemas, indexes = [], []
    for stmt in filter(None, (s.strip() for s in ddl.split(";"))):
        im = _INDEX.match(stmt)
        if im:
            kind, name, on, cols = im.groups()
            col_names = [re.sub(r"\(\s*\d+\s*\)", "", c).strip()
                         for c in cols.split(",") if c.strip()]
            indexes.append(IndexDef(kind.lower(), name, on, col_names))
            continue
        cm = _CREATE.match(stmt)
        if cm:
            kind, name, body, ttl_dur, ttl_col = cm.groups()
            schema, defaults = _parse_cols(body)
            schemas.append(SchemaDef(kind.lower(), name, schema, defaults,
                                     ttl_col or None, int(ttl_dur or 0)))
            continue
        raise ValueError(f"unrecognized DDL statement: {stmt[:60]!r}")
    return schemas, indexes
