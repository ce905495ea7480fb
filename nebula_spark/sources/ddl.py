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
    # greedy body up to the LAST close-paren so fixed_string(5) column
    # defs nest; the tail (ttl options) never contains parens
    r"create\s+(tag|edge)\s+(if\s+not\s+exists\s+)?(\w+)\s*\((.*)\)"
    r"\s*(.*?)\s*$",
    re.IGNORECASE | re.DOTALL)
_TTL_OPT = re.compile(
    r"(ttl_duration)\s*=\s*(\d+)|(ttl_col)\s*=\s*\"?([\w]*)\"?",
    re.IGNORECASE)
_INDEX = re.compile(
    r"create\s+(tag|edge)\s+index\s+(if\s+not\s+exists\s+)?(\w+)\s+on\s+"
    # cols body: names with optional numeric length hints —
    # `ON edge_1(col1_str(10))` (EdgeIndexFullScan.feature); geo index
    # params + comment follow (GeoBase.feature `with (s2_max_level=30)
    # comment "test"`)
    r"(\w+)\s*\(((?:[^()]|\(\s*\d+\s*\))*)\)"
    r"(?:\s+with\s*\(([^)]*)\))?"
    r"(?:\s+comment\s+(\"[^\"]*\"|'[^']*'))?\s*$",
    re.IGNORECASE | re.DOTALL)
_COL = re.compile(
    # name type [(len)] | List< t > | Set< t > (Ddl.feature container
    # prop types) | geography(point|linestring|polygon) (GeoBase.feature
    # shape-constrained columns)
    r"(\w+)\s+(\w+(?:\s*<\s*\w+\s*>"
    r"|\s*\(\s*(?:point|linestring|polygon)\s*\))?)"
    r"(?:\s*\(\s*(\d+)\s*\))?"
    # DEFAULT takes the rest of the column def up to an optional COMMENT
    # — it may be a constant expression like datetime("…") that the
    # statement re-serializer spaced out into several tokens
    # nullability: NOT NULL or an explicit NULL (parser.yy column_spec —
    # bare NULL is the default and parses as a no-op,
    # TimeDefaultValue.feature `col1 date NULL default NULL`)
    r"(\s+not\s+null|\s+null)?(?:\s+default\s+(.+?))?"
    # COMMENT and the nullability spec may come in either order
    # (schema/Comment.feature `name string COMMENT '…' null`)
    r"(?:\s+comment\s+(\"[^\"]*\"|'[^']*'))?"
    r"(\s+not\s+null|\s+null)?\s*$", re.IGNORECASE)


@dataclass
class SchemaDef:
    kind: str                    # tag | edge
    name: str
    schema: StructType
    defaults: dict = field(default_factory=dict)
    ttl_col: str | None = None
    ttl_duration: int = 0
    # declared (reference) type name per column — preserved because the
    # Spark StructType collapses int8/16/32 and timestamp, but
    # SHOW CREATE TAG must echo the original (TTL.feature Schematest)
    decl: list = field(default_factory=list)   # [(col, ref_type_name)]
    comments: dict = field(default_factory=dict)  # per-column COMMENT text
    if_not_exists: bool = False
    schema_comment: str | None = None           # COMMENT = "…" metadata


@dataclass
class IndexDef:
    kind: str
    name: str
    on: str
    cols: list[str]
    if_not_exists: bool = False
    # geo index params (GeoIndex.cpp s2 covering knobs) + comment —
    # metadata echoed by SHOW CREATE INDEX (GeoBase.feature)
    options: list = field(default_factory=list)   # [(key, value)]
    comment: str | None = None
    # column spellings WITH fixed-string lengths (`name(8)`) for
    # SHOW CREATE INDEX echo (schema/Comment.feature)
    cols_spec: list = field(default_factory=list)


def _split_cols(body: str) -> list[str]:
    """Split column defs on top-level commas only — DEFAULT expressions
    nest commas (ST_Point(3, 8), ST_GeogFromText("LINESTRING(0 1, 2 3)"),
    GeoBase.feature)."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_cols(body: str) -> tuple[StructType, dict, list, dict]:
    fields, defaults, decl, comments = [], {}, [], {}
    for part in _split_cols(body):
        m = _COL.match(part)
        if not m:
            raise ValueError(f"bad column def: {part!r}")
        name, typ, flen, notnull, default, comment, notnull2 = m.groups()
        notnull = notnull or notnull2
        if flen is not None and typ.lower() == "fixed_string" \
            and int(flen) < 1:
            # parser.yy: fixed_string length must be positive
            # (schema/Schema.feature "Forbid out of range length")
            raise SyntaxError(f"Out of range: near `{flen}))'")
        # the group also matches an explicit bare NULL — that spells
        # the default nullability, not a constraint
        if notnull is not None and "not" not in notnull.lower():
            notnull = None
        if comment is not None:
            comments[name] = comment[1:-1]
        ref_type = typ.lower()
        cm = re.fullmatch(r"(list|set)\s*<\s*(\w+)\s*>", ref_type)
        if cm:
            # List< t > / Set< t > → ArrayType(t); DESC echoes the
            # reference's list_t / set_t names (Ddl.feature). Sets
            # dedup on write (INSERT applies array_distinct).
            inner = cm.group(2)
            elem = _TYPE_MAP.get(inner)
            if elem is None:
                raise ValueError(f"unknown element type {inner!r}")
            from pyspark.sql.types import ArrayType
            ref_type = f"{cm.group(1)}_{inner}"
            fields.append(StructField(name, ArrayType(elem),
                                      nullable=notnull is None))
            decl.append((name, ref_type))
            if default is not None:
                defaults[name] = default.strip("\"'")
            continue
        if ref_type.startswith("geography") and "(" in ref_type:
            # shape-constrained geography(point|linestring|polygon):
            # stored as WKT strings like plain geography, shape enforced
            # at INSERT (GeoBase.feature "test geo CURD")
            typ, ref_type = "geography", re.sub(r"\s+", "", ref_type)
        if ref_type == "fixed_string":
            # keep the byte limit in the declared type so INSERT can
            # apply the reference's whole-codepoint truncation
            # (FetchEmpty.feature "Tag Fixed String Property")
            typ, ref_type = "string", f"fixed_string({flen})"
        if ref_type == "int":
            ref_type = "int64"
        dt = _TYPE_MAP.get(typ.lower())
        if dt is None:
            raise ValueError(f"unknown type {typ!r} in {part!r}")
        fields.append(StructField(name, dt, nullable=notnull is None))
        decl.append((name, ref_type))
        if default is not None:
            defaults[name] = default.strip("\"'")
    return StructType(fields), defaults, decl, comments


def parse_ddl(ddl: str) -> tuple[list[SchemaDef], list[IndexDef]]:
    """Parse a `schema:` block (semicolon-separated CREATE statements)."""
    schemas, indexes = [], []
    for stmt in filter(None, (s.strip() for s in ddl.split(";"))):
        im = _INDEX.match(stmt)
        if im:
            kind, ine, name, on, cols, opts, comment = im.groups()
            col_names = [re.sub(r"\(\s*\d+\s*\)", "", c).strip()
                         for c in cols.split(",") if c.strip()]
            options = []
            for o in (opts or "").split(","):
                if "=" in o:
                    k, v = o.split("=", 1)
                    options.append((k.strip(), v.strip()))
            indexes.append(IndexDef(kind.lower(), name, on, col_names,
                                    bool(ine), options,
                                    comment[1:-1] if comment else None,
                                    [c.strip() for c in cols.split(",")
                                     if c.strip()]))
            continue
        cm = _CREATE.match(stmt)
        if cm:
            kind, ine, name, body, tail = cm.groups()
            schema, defaults, decl, comments = _parse_cols(body)
            # schema-level COMMENT = "…" metadata — kept for
            # SHOW CREATE (schema/Comment.feature)
            scm = re.search(r"comment\s*=\s*(\"[^\"]*\"|'[^']*')",
                            tail, flags=re.IGNORECASE)
            schema_comment = scm.group(1)[1:-1] if scm else None
            tail = re.sub(r"comment\s*=\s*(\"[^\"]*\"|'[^']*')", "",
                          tail, flags=re.IGNORECASE)
            ttl_dur, ttl_col = 0, None
            consumed = 0
            for om in _TTL_OPT.finditer(tail):
                consumed += len(om.group(0))
                if om.group(1):
                    ttl_dur = int(om.group(2))
                    if ttl_dur > 2**63 - 1:
                        # TTL2.feature: INT64 max is legal, +1 is the
                        # lexer's out-of-range error
                        raise SyntaxError(
                            f"Out of range: near `{om.group(2)}'")
                else:
                    ttl_col = om.group(4) or None
            if len(re.sub(r"[\s,]", "", tail)) != \
                    len(re.sub(r"[\s,]", "", "".join(
                        om.group(0) for om in _TTL_OPT.finditer(tail)))):
                raise ValueError(f"bad CREATE options: {tail!r}")
            # reference TTL validation (TTL.feature Schematest):
            # a duration needs a column, and the column must be a
            # timestamp/int64 type
            if ttl_dur > 0 and not ttl_col:
                # TTL2.feature "ttl ddl": a duration with no column is
                # the reference's "Implicit ttl_col not support"
                raise ValueError("Implicit ttl_col not support")
            if ttl_col:
                typ = dict(decl).get(ttl_col)
                if typ is None:
                    raise ValueError(f"unknown ttl_col {ttl_col!r}")
                if typ.lower() not in ("int", "int64", "timestamp"):
                    # float/string TTL columns are illegal
                    # (TTL2.feature "Ttl column type illegal")
                    raise ValueError("Ttl column type illegal")
            schemas.append(SchemaDef(kind.lower(), name, schema, defaults,
                                     ttl_col, ttl_dur, decl, comments,
                                     ine is not None, schema_comment))
            continue
        raise ValueError(f"unrecognized DDL statement: {stmt[:60]!r}")
    return schemas, indexes
