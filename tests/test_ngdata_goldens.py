"""TCK goldens over the reference's `ngdata` fixture — the randomized
multi-label / null-heavy space behind expression/Attribute1.feature and
expression/BugFixWithngdata.feature (reference loader:
tests/conftest.py:235 load_ngdata_data → tests/data/ngdata/*.csv).

The fixture is loaded from the reference's own CSVs (same pattern as the
nba goldens): 14 tags × ~50-60 int vids each and 8 edge types. Null
semantics come from tag MEMBERSHIP, not null cells — a vid absent from
Label_5.csv makes `v.Label_5.Label_5_7_Bool` EMPTY/NULL.

Temporal cells hold constructor calls (`date()`, `now()`, …) whose
values the goldens never read — they load as deterministic placeholders.
Geography cells load as their WKT payload.
"""

from __future__ import annotations

import csv
import datetime as _dt
import os
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DateType, DoubleType, LongType,
                               StringType, StructField, StructType,
                               TimestampNTZType)

from nebula_spark.catalog import GraphSpace
from nebula_spark.plans import execute

NGDATA_DIR = "/root/reference/tests/data/ngdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(NGDATA_DIR), reason="reference ngdata fixture absent")

_TAG_FILES = ["Label_0", "Label_1", "Label_2", "Label_3", "Label_4",
              "Label_5", "Label_6", "Label_7", "Label_8", "Label_9",
              "Label_10", "Label_11", "Label_same_prop_0",
              "Label_same_prop_1", "Label_ttl_0"]
_EDGE_FILES = ["Rel_0", "Rel_1", "Rel_2", "Rel_3", "Rel_4", "Rel_5",
               "Edge_ttl_0", "Edge_label_limits"]

# placeholder values for temporal constructor cells (`date()`, `now()`,
# `datetime()`, `time()`) — the goldens never read these columns, they
# only need to be non-null and schema-stable
_SPARK_TYPE = {
    "int": LongType(), "double": DoubleType(), "bool": BooleanType(),
    "string": StringType(), "date": DateType(),
    "datetime": TimestampNTZType(), "timestamp": LongType(),
    "time": StringType(), "geography": StringType(),
}


def _parse_cell(raw: str, t: str):
    if raw.strip().lower() in ("null", "__null__"):
        return None              # bare null cell (quoted 'Null…' is data)
    t = t.split("(")[0]
    if t == "int":
        return int(raw)
    if t == "double":
        return float(raw)
    if t == "bool":
        return raw.strip().lower() == "true"
    if t == "string":
        s = raw.strip()
        if s.startswith("'") and s.endswith("'"):
            s = s[1:-1]
        return s.replace("\\'", "'")
    if t == "date":
        return _dt.date(2021, 1, 1)
    if t == "datetime":
        return _dt.datetime(2021, 1, 1)
    if t == "timestamp":
        return 1600000000
    if t == "time":
        return "00:00:00.000000"
    if t == "geography":
        m = re.search(r'ST_GeogFromText\("(.*)"\)', raw)
        return m.group(1) if m else raw
    raise ValueError(f"unhandled ngdata type {t!r}")


def _load(spark, name: str, is_edge: bool):
    with open(f"{NGDATA_DIR}/{name}.csv", newline="") as f:
        rdr = csv.reader(f)
        header = next(rdr)
        nkey = 2 if is_edge else 1
        props = []
        for h in header[nkey:]:
            col, typ = h.split(":")
            props.append((col.split(".", 1)[1], typ.strip().lower()))
        rows = []
        for rec in rdr:
            if not rec:
                continue
            key = [int(v) for v in rec[:nkey]]
            vals = [_parse_cell(v, t) for v, (_c, t) in
                    zip(rec[nkey:], props)]
            rows.append((*key, *(0,) * (nkey == 2), *vals))
    key_fields = ([StructField("src", LongType(), False),
                   StructField("dst", LongType(), False),
                   StructField("_rank", LongType(), False)]
                  if is_edge else [StructField("vid", LongType(), False)])
    schema = StructType(key_fields + [
        StructField(c, _SPARK_TYPE[t.split("(")[0]], True)
        for c, t in props])
    df = spark.createDataFrame(rows, schema)
    key = ["src", "dst", "_rank"] if is_edge else ["vid"]
    return df.dropDuplicates(key)


@pytest.fixture(scope="module")
def ngdata_space(spark):
    sp = GraphSpace(spark, "ngdata")
    sp.options = {"vid_type": "int64"}
    for t in _TAG_FILES:
        sp.create_tag(t, df=_load(spark, t, False))
    for e in _EDGE_FILES:
        sp.create_edge(e, df=_load(spark, e, True))
    return sp


def test_attribute_with_null_data(ngdata_space):
    """expression/Attribute1.feature "Attribute with null data" — UNWIND
    nodes(p) then `alias.tag.prop` over vertices that may LACK the tag:
    EMPTY access filters the row, truthiness and `== true` agree."""
    for where in ("ua0.Label_5.Label_5_7_Bool",
                  "ua0.Label_5.Label_5_7_Bool == true"):
        df = execute(ngdata_space,
                     "MATCH p0 = (v0)-[e0]->() "
                     "WHERE id(v0) in [1,2,3,4,5,6,7,8,9,10] "
                     "UNWIND nodes(p0) AS ua0 "
                     "with ua0 "
                     f"where {where} "
                     "return count(*)")
        assert [tuple(r) for r in df.collect()] == [(61,)], where


def test_comparing_empty_values(ngdata_space):
    """expression/BugFixWithngdata.feature "Comparing EMPTY values" —
    props absent from Label_6's schema read as EMPTY; EMPTY == EMPTY is
    not truthy, so the filter drops every row."""
    df = execute(ngdata_space,
                 "MATCH (v0:Label_0)-[e0]->()-[e1*1..1]->(v1) "
                 "WHERE (id(v0) == 11) AND "
                 "(v1.Label_6.Label_6_400_Int == v1.Label_6.Label_6_500_Int) "
                 "RETURN count(*)")
    assert [tuple(r) for r in df.collect()] == [(0,)]
